"""Merge per-frame PIXIE/SMPL-X parameter pickles into the single
``initialization_pixie`` stream the FLAME-fitting stage consumes.

Exact contract port of src/preprocessing/merge_smplx_predictions.py: the
output file is a CONCATENATED pickle stream (one ``pickle.dump`` per frame,
in sorted path order) — readers call ``pickle.load`` repeatedly on one open
file handle.  Input layout: <data_path>/pixie/<frame>/<name>_param.pkl.
"""
from __future__ import annotations

import argparse
import os
import pickle
from glob import glob


def merge(data_path: str, out_name: str = "initialization_pixie") -> int:
    param_paths = sorted(glob(os.path.join(data_path, "pixie", "*", "*_param.pkl")))
    out_path = os.path.join(data_path, out_name)
    with open(out_path, "wb") as out:
        for p in param_paths:
            with open(p, "rb") as f:
                pickle.dump(pickle.load(f), out)
    return len(param_paths)


def read_stream(path: str):
    """Iterate the concatenated pickle stream (the reader-side contract)."""
    with open(path, "rb") as f:
        while True:
            try:
                yield pickle.load(f)
            except EOFError:
                return


def main(argv=None):
    ap = argparse.ArgumentParser("merge_smplx_predictions")
    ap.add_argument("--data_path", required=True)
    args = ap.parse_args(argv)
    n = merge(args.data_path)
    print(f"merged {n} pixie param pickles -> "
          f"{os.path.join(args.data_path, 'initialization_pixie')}")


if __name__ == "__main__":
    main()
