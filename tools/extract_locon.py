"""Extract a LoCon adapter from the diff of two model checkpoints.

TPU-native analog of reference tools/extract_locon.py:7-190. Instead of
kohya's SD-checkpoint loaders, this operates on raw state-dict checkpoints
(.safetensors / .pt): any two checkpoints of the same architecture work
(diffusers UNet, SDXL SGM, text encoders, ...). Layer kinds are inferred
from weight shapes; the SVD runs as XLA batched SVD on the default device.

Usage:
  python tools/extract_locon.py [flags] <base_ckpt> <db_ckpt> <out_file>

Flags mirror the reference: --mode fixed|threshold|ratio|quantile|full,
--linear_dim/--conv_dim (fixed), --linear_threshold/--conv_threshold, etc.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("base_model", help="base checkpoint (.safetensors/.pt)")
    parser.add_argument("db_model", help="tuned checkpoint (.safetensors/.pt)")
    parser.add_argument("output_name", help="output adapter file (.safetensors)")
    parser.add_argument("--is_sdxl", action="store_true", help="unused; kept for flag parity")
    parser.add_argument("--prefix", default="lora_unet", help="lora_name prefix for all layers")
    parser.add_argument(
        "--mode",
        default="fixed",
        choices=["fixed", "threshold", "ratio", "quantile", "full"],
    )
    parser.add_argument("--safetensors", action="store_true", default=True)
    parser.add_argument("--linear_dim", type=int, default=64)
    parser.add_argument("--conv_dim", type=int, default=64)
    parser.add_argument("--linear_threshold", type=float, default=0.0)
    parser.add_argument("--conv_threshold", type=float, default=0.0)
    parser.add_argument("--linear_ratio", type=float, default=0.0)
    parser.add_argument("--conv_ratio", type=float, default=0.0)
    parser.add_argument("--linear_quantile", type=float, default=0.75)
    parser.add_argument("--conv_quantile", type=float, default=0.75)
    parser.add_argument("--use_sparse_bias", action="store_true")
    parser.add_argument("--sparsity", type=float, default=0.98)
    parser.add_argument("--disable_cp", action="store_true")
    return parser.parse_args()


def main():
    args = get_args()
    from lycoris_tpu.graph import ModelGraph
    from lycoris_tpu.utils.extract import extract_diff
    from lycoris_tpu.wrapper import load_file_sd
    from safetensors.numpy import save_file
    import numpy as np

    mode_params = {
        "fixed": (args.linear_dim, args.conv_dim),
        "threshold": (args.linear_threshold, args.conv_threshold),
        "ratio": (args.linear_ratio, args.conv_ratio),
        "quantile": (args.linear_quantile, args.conv_quantile),
        "full": (0, 0),
    }
    linear_param, conv_param = mode_params[args.mode]

    base = ModelGraph.from_state_dict(load_file_sd(args.base_model))
    db = ModelGraph.from_state_dict(load_file_sd(args.db_model))

    sd = extract_diff(
        [],
        [],
        base,
        db,
        mode=args.mode,
        linear_mode_param=linear_param,
        conv_mode_param=conv_param,
        use_bias=args.use_sparse_bias,
        sparsity=args.sparsity,
        small_conv=not args.disable_cp,
    )
    if args.prefix != "lora_unet":
        sd = {k.replace("lora_unet_", f"{args.prefix}_", 1): v for k, v in sd.items()}
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    save_file(sd, args.output_name)
    print(f"saved {len(sd)} tensors to {args.output_name}")


if __name__ == "__main__":
    main()
