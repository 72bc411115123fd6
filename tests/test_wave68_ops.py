"""Wave-68 operator pins: mutual-NN pairs, rank overlap@depth,
pointer doubling."""

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
def test_mutual_nn_requires_both_directions(tmp_path):
    """0 and 1 are each other's NN (mutual); 2's NN is 0 but 0's NN is
    1, so 2 joins no pair."""
    from basicocr_ray.pipelines.queries import QUERIES

    vecs = {
        0: [1.0, 0.0],
        1: [0.9, 0.1],   # nn(0)=1 (dot 900), nn(1)=0
        2: [0.8, -0.6],  # nn(2)=0 (dot 800 vs 660 with 1)
    }
    _write(
        tmp_path,
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": list(vecs),
                "embedding": [np.array(v, dtype=np.float32)
                              for v in vecs.values()],
                "label": np.zeros(len(vecs), dtype=np.int32),
            }
        ),
    )
    got = (
        QUERIES["q276_mutual_nn_pairs"](str(tmp_path)).to_pandas()
        .sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert got[["a", "b"]].values.tolist() == [[0, 1]]
    # float32(0.9) = 0.89999997..., so floor(1000*0.9f) = 899:
    # dot = floor(1000*1.0)*899 + 0*floor(1000*0.1f)
    assert int(got["dot"].iloc[0]) == 1000 * 899


@pytest.mark.usefixtures("ray_session")
def test_rank_overlap_depth_monotone_and_exact(tmp_path):
    """Half-0 ranks: a,b; half-1 ranks: b,c -> overlap@1 = 0 (a vs b),
    overlap@2 = 1 ({a,b} ∩ {b,c} = {b})."""
    from basicocr_ray.pipelines.queries import QUERIES

    docs = [
        (0, "a a a b"),   # half 0: a(3+...), b
        (2, "a b"),
        (1, "b b b c"),   # half 1: b, c
        (3, "b c"),
    ]
    _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "doc_id": [d for d, _ in docs],
                "text": [t for _, t in docs],
                "lang": ["en"] * 4,
                "source": ["s"] * 4,
                "n_chars": [len(t) for _, t in docs],
            }
        ),
    )
    got = QUERIES["q277_rank_overlap_depth"](str(tmp_path))
    ov = dict(zip(got["depth"], got["overlap"]))
    # half0 tokens: a(4), b(2); half1: b(4), c(2); common = {b} with
    # ranks (2, 1) -> overlap plateaus at 1 once depth >= 2
    assert ov[1] == 0
    assert ov[2] == 1
    assert ov[3] == 1
    assert ov[20] == 1


@pytest.mark.usefixtures("ray_session")
def test_pointer_doubling_equals_eight_hops(tmp_path):
    """f^8 from three squarings equals eight sequential applications."""
    from basicocr_ray.pipelines.queries import QUERIES

    n = 37
    _write(tmp_path, "documents", pd.DataFrame({"doc_id": range(n)}))

    def f(u):
        return (3 * u + 1) % n

    expect = {}
    for u in range(n):
        x = u
        for _ in range(8):
            x = f(x)
        expect[u] = x

    got = (
        QUERIES["q278_pointer_doubling"](str(tmp_path)).to_pandas()
        .set_index("doc_id")["f8"].to_dict()
    )
    assert got == expect
