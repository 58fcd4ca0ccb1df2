#!/usr/bin/env python
"""Top-level entry point mirroring the reference's HC-SpMM_main.py usage:

    python main.py --dataset example --dim 96 --num_layers 6 --hidden 32 \
                   --classes 22 --epochs 200 --model gcn [--single_kernel]
"""
from hcspmm_tpu.train.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
