#!/usr/bin/env python
"""Convert a pretrained ESM-2 checkpoint (fair-esm .pt or HF directory)
into the torch-free .npz format loaded by gcpnet_tpu.nn.esm.

Usage:
    python scripts/convert_esm_checkpoint.py esm2_t33_650M_UR50D.pt out.npz
    GCPNET_ESM_CHECKPOINT=out.npz python train.py experiment=gcpnet_eq
"""

import sys


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    from gcpnet_tpu.utils.esm_convert import load_checkpoint, save_npz

    params, cfg = load_checkpoint(src)
    save_npz(dst, params, cfg)
    print(f"wrote {dst}: {cfg}")


if __name__ == "__main__":
    main()
