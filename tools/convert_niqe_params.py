#!/usr/bin/env python
"""Extract NIQE pristine MVG parameters from a reference checkout.

    python tools/convert_niqe_params.py /path/to/reference OUT.npz

The reference ships them as a binary blob
(mmedited/core/evaluation/niqe_pris_params.npz); we don't vendor data —
point CIAOSR_NIQE_PARAMS at the produced file.
"""

import argparse
import os
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("reference_root")
    p.add_argument("out")
    args = p.parse_args()
    src = os.path.join(args.reference_root,
                       "mmedited/core/evaluation/niqe_pris_params.npz")
    if not os.path.exists(src):
        sys.exit(f"not found: {src}")
    data = np.load(src)
    np.savez(args.out,
             mu_pris_param=data["mu_pris_param"],
             cov_pris_param=data["cov_pris_param"],
             gaussian_window=data["gaussian_window"])
    print(f"wrote {args.out}; export CIAOSR_NIQE_PARAMS={args.out}")


if __name__ == "__main__":
    main()
