"""Merge a LyCORIS adapter file into a full model checkpoint.

TPU-native analog of reference tools/merge.py:63-127, operating on raw
state-dict checkpoints (any architecture) instead of kohya SD loaders.

Usage:
  python tools/merge.py <base_ckpt> <lycoris_file> <out_ckpt> [--weight 1.0]
  [--prefix lora_unet] [--dtype float16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("base_model")
    parser.add_argument("lycoris_model")
    parser.add_argument("output_name")
    parser.add_argument("--weight", type=float, default=1.0)
    parser.add_argument("--prefix", default="lora_unet")
    parser.add_argument("--dtype", default=None, choices=[None, "float16", "bfloat16", "float32"])
    parser.add_argument("--is_sdxl", action="store_true", help="apply diffusers→SGM key conversion")
    return parser.parse_args()


def main():
    args = get_args()
    import numpy as np
    from safetensors.numpy import save_file

    from lycoris_tpu.graph import ModelGraph
    from lycoris_tpu.utils.merge import merge
    from lycoris_tpu.wrapper import load_file_sd

    base_sd = load_file_sd(args.base_model)
    lyco_sd = load_file_sd(args.lycoris_model)
    if args.prefix != "lora_unet":
        lyco_sd = {k.replace(f"{args.prefix}_", "lora_unet_", 1): v for k, v in lyco_sd.items()}

    graph = ModelGraph.from_state_dict(base_sd)
    merged_trees, count = merge([], graph, lyco_sd, scale=args.weight)
    merged = merged_trees["lora_unet"]

    out_sd = dict(base_sd)
    for name, sub in merged.items():
        out_sd[f"{name}.weight"] = np.asarray(sub["weight"])
        if "bias" in sub:
            out_sd[f"{name}.bias"] = np.asarray(sub["bias"])
    if args.dtype:
        out_sd = {k: np.asarray(v).astype(args.dtype) for k, v in out_sd.items()}
    out_sd = {k: np.ascontiguousarray(v) for k, v in out_sd.items()}
    save_file(out_sd, args.output_name)
    print(f"merged {count} modules -> {args.output_name}")


if __name__ == "__main__":
    main()
