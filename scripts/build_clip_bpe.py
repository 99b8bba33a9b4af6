"""Convert an OpenAI-CLIP BPE merge table (.txt.gz) into skix's npz asset.

The merge table is public configuration data (the open_clip/CLIP
``bpe_simple_vocab_16e6.txt.gz``); this script re-serializes it into
``skix/assets/clip_bpe.npz`` (one string per merge, rank = position) so
the tokenizer has no runtime dependency on external files.

Usage: python scripts/build_clip_bpe.py <path-to-bpe.txt.gz> [out.npz]
"""

from __future__ import annotations

import gzip
import sys
from pathlib import Path

import numpy as np


def main() -> None:
    src = Path(sys.argv[1])
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else (
        Path(__file__).resolve().parent.parent / "skix" / "assets"
        / "clip_bpe.npz")
    merges = gzip.open(src).read().decode("utf-8").split("\n")
    # open_clip slice: drop header line, keep 49152-256-2 merges
    merges = merges[1: 49152 - 256 - 2 + 1]
    merges = [m for m in merges if len(m.split()) == 2]
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, merges=np.asarray(merges, dtype=object))
    print(f"wrote {len(merges)} merges -> {out}")


if __name__ == "__main__":
    main()
