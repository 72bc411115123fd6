"""basicocr_ray — a Ray-Data-native main-content extraction engine.

From-scratch re-expression of the query/data-processing capabilities of the
reference OCR repo (tongpi/basicOCR) over Common-Crawl-style web pages:

    raw HTML bytes  --tokenize-->  DOM blocks        (detection analogue)
                    --score----->  keep/drop labels  (per-frame class probs)
                    --decode---->  main text + spans (CTC greedy collapse)
                    --correct--->  dictionary/normalization post-pass

Everything is built on ``ray.data.Dataset`` + ``map_batches`` over zero-copy
Arrow batches; stateful stages (trie corrector, AC stripper, PDF parser) are
actor pools. Library code NEVER calls ``ray.init()`` — sessions are owned by
scripts/tests only.
"""

__version__ = "0.1.0"
