"""Dataset sources/sinks (pages reader, documents→pages synthesizer)."""
