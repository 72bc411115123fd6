"""Wave-71 operator pins: simultaneous order-stat descent, joint decile
grid, Hamilton apportionment, survival at-risk table."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, df):
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / f"{name}.parquet"),
    )


@pytest.mark.usefixtures("ray_session")
def test_global_order_stats_multi_k_exact():
    """Every k of a wide-range multiset resolves exactly (vs numpy
    sort), in one shared descent."""
    import ray.data

    from basicocr_ray.stages.wide import global_order_stats

    rng = np.random.RandomState(7)
    vals = np.concatenate(
        [
            rng.randint(0, 10_000_000, size=5000),
            np.array([0, 0, 9_999_999]),  # duplicated extremes
        ]
    ).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"c": pa.array(vals)}))
    ks = [1, 2, 17, 2500, 5001, len(vals)]
    got = global_order_stats(ds, ks, num_buckets=64)
    s = np.sort(vals)
    assert got == {k: int(s[k - 1]) for k in ks}


@pytest.mark.usefixtures("ray_session")
def test_decile_grid_small_exact(tmp_path):
    """10 events, 2 users: thresholds at ceil(j*n/10) = each value;
    band(v) = 1 + #{thresholds < v}. user u1 has 6 events, u2 has 4 ->
    uband(u1)=1+#{t<6} etc., grid row sums = 10."""
    from basicocr_ray.pipelines.queries import QUERIES

    vals = [float(i + 1) for i in range(10)]  # cents 100..1000, distinct
    users = [1] * 6 + [2] * 4
    _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_id": range(10),
                "user_id": users,
                "event_type": ["x"] * 10,
                "value": vals,
            }
        ),
    )
    got = QUERIES["q285_decile_grid"](str(tmp_path)).to_pandas()
    assert int(got["n_events"].sum()) == 10
    # user counts: {1: 6, 2: 4}; nu=2 -> threshold ranks ceil(j*2/10)
    # = 1 for j<=5 (value 4) and 2 for j>=6 (value 6): thresholds =
    # [4,4,4,4,4,6,6,6,6]. uband(u2) = 1 + #{t<4} = 1,
    # uband(u1) = 1 + #{t<6} = 6
    ub = dict(
        got.groupby("uband")["n_events"].sum()
    )
    assert ub == {1: 4, 6: 6}
    # value thresholds = 100..900; vband(v_i) = i for cents 100..900,
    # vband(1000) = 10
    vb = dict(got.groupby("vband")["n_events"].sum())
    assert vb == {i: 1 for i in range(1, 9 + 1)} | {10: 1}


@pytest.mark.usefixtures("ray_session")
def test_apportionment_largest_remainder(tmp_path):
    """counts (en,de,fr) = (5,3,2) over S=1000 -> exact thirds:
    5/10->500, 3/10->300, 2/10->200, no leftovers; counts (1,1,1):
    base 333 each, leftover 1 goes to 'de'? no — largest remainder
    ties break lang ASC -> 'de' < 'en' < 'fr', all rem equal -> de."""
    from basicocr_ray.pipelines.queries import QUERIES

    def docs(langs):
        _write(
            tmp_path,
            "documents",
            pd.DataFrame(
                {
                    "doc_id": range(len(langs)),
                    "text": ["t"] * len(langs),
                    "lang": langs,
                    "source": ["s"] * len(langs),
                    "n_chars": [1] * len(langs),
                }
            ),
        )

    docs(["en"] * 5 + ["de"] * 3 + ["fr"] * 2)
    got = QUERIES["q286_apportionment"](str(tmp_path))
    d = dict(zip(got["lang"], got["slots"]))
    assert d == {"en": 500, "de": 300, "fr": 200}
    assert int(got["slots"].sum()) == 1000

    docs(["en", "de", "fr"])
    got = QUERIES["q286_apportionment"](str(tmp_path))
    d = dict(zip(got["lang"], got["slots"]))
    assert d == {"de": 334, "en": 333, "fr": 333}


@pytest.mark.usefixtures("ray_session")
def test_survival_suffix_sums(tmp_path):
    """lifetimes (days): u1=0, u2=0, u3=2 -> ending (0:2, 2:1),
    at_risk (0:3, 2:1)."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-05-01")
    rows = [
        (1, base), (1, base + pd.Timedelta(hours=3)),
        (2, base),
        (3, base), (3, base + pd.Timedelta(days=2, hours=1)),
    ]
    _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(rows)),
                "user_id": [u for u, _ in rows],
                "ts": [t for _, t in rows],
            }
        ),
    )
    got = QUERIES["q287_survival_at_risk"](str(tmp_path))
    assert got.values.tolist() == [[0, 2, 3], [2, 1, 1]]
