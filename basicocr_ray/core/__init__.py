"""Pure, deterministic single-document kernels shared by the oracle and the
distributed stages. No Ray imports here."""
