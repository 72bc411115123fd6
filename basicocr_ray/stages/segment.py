"""Segmentation stage — actor pool holding the broadcast lexicon (M14).

The reference's HanLP pass (`Test.java:20-53`) loads the segmenter once
and streams lines through it; the Ray translation is the A1/A2 stateful
pattern: lexicon `ray.put` once, `FmmSegmenter` built per actor in
``__init__``, batches segmented in ``__call__``.
"""

from __future__ import annotations

import pyarrow as pa

from basicocr_ray.core.segment import FmmSegmenter


class SegmentTokenizer:
    """``map_batches(SegmentTokenizer, concurrency=N)`` body.

    Emits per row: ``segments`` (list<string>, order preserved),
    ``n_segments`` and ``n_distinct_segments`` (int64) — the integer
    columns give SQL oracles a handle on the segmentation without
    expressing FMM in SQL."""

    def __init__(self, lexicon_ref, column: str = "text", id_column: str = "doc_id"):
        import ray

        lex = (
            ray.get(lexicon_ref)
            if isinstance(lexicon_ref, ray.ObjectRef)
            else lexicon_ref
        )
        self.seg = FmmSegmenter(lex)
        self.column = column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column]
        segs = [self.seg.segment(t or "") for t in batch[self.column].to_pylist()]
        return pa.table(
            {
                self.id_column: ids,
                "segments": pa.array(segs, pa.list_(pa.string())),
                "n_segments": pa.array([len(s) for s in segs], pa.int64()),
                "n_distinct_segments": pa.array(
                    [len(set(s)) for s in segs], pa.int64()
                ),
            }
        )


def segment_documents(ds, lexicon, column: str = "text", id_column: str = "doc_id",
                      concurrency=2):
    """docs → segmented rows via broadcast lexicon + actor pool."""
    import ray

    ref = ray.put(list(lexicon))
    return ds.map_batches(
        SegmentTokenizer,
        fn_constructor_kwargs={
            "lexicon_ref": ref,
            "column": column,
            "id_column": id_column,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
