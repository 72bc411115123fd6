"""Single-document extraction demo — the `contrib/crnn/demo.py` analogue.

    python scripts/extract_demo.py <file.html> [--raw]

Runs the full oracle kernel chain on one local file and prints the
extracted main text (with --raw, also the pre-collapse block sequence —
mirroring demo.py printing raw and collapsed decodes side by side,
`demo.py:40-42`). No Ray session: this is the single-process path the
distributed pipeline shares kernels with.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--raw", action="store_true",
                    help="also print the pre-collapse block sequence")
    args = ap.parse_args()

    from basicocr_ray.core.charset import sniff_decode
    from basicocr_ray.core.oracle import extract_one
    from basicocr_ray.core.score import score_block
    from basicocr_ray.core.tokenize import tokenize_html

    data = open(args.path, "rb").read()
    r = extract_one(data)
    if args.raw and not data.startswith(b"%PDF"):
        try:
            text, enc = sniff_decode(data)
            for b in tokenize_html(text):
                _, ld, score, keep = score_block(b)
                mark = "KEEP" if keep else "drop"
                print(f"[{mark}] #{b.block_id:<3d} <{b.tag}> "
                      f"ld={ld:.2f} s={score:7.1f}  {b.text[:60]!r}")
            print("-" * 60)
        except Exception as exc:
            print(f"(raw dump unavailable: {exc})")
    if not r["ok"]:
        print(f"extraction failed: {r['error']}", file=sys.stderr)
        return 1
    print(r["main_text"])
    print(
        f"\n-- {r['n_blocks_kept']}/{r['n_blocks']} blocks kept, "
        f"encoding={r['encoding']}, {len(r['spans'])} spans",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
