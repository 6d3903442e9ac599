"""Batch HCP-diffusion ⇄ webui LoRA format converter (CLI).

Reference: tools/batch_hcp_convert.py:391-687. The key-conversion logic
lives in lycoris_tpu.utils.hcp_convert; this CLI pairs unet/te files by name
and converts whole directories.

Usage:
  # HCP (unet-*.safetensors + text_encoder-*.safetensors pairs) -> webui
  python tools/batch_hcp_convert.py to_webui --src <files/dirs...> --dst_dir D [--sdxl] [--auto_scale_alpha]

  # webui -> HCP (emits unet-*.safetensors / text_encoder-*.safetensors)
  python tools/batch_hcp_convert.py from_webui --src <files/dirs...> --dst_dir D [--sdxl] [--auto_scale_alpha]
"""

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def gather(paths, exts=(".safetensors", ".pt"), recursive=False):
    files = []
    for p in paths:
        if os.path.isfile(p) and p.endswith(tuple(exts)):
            files.append(p)
        elif os.path.isdir(p):
            for root, _, fns in os.walk(p):
                files += [os.path.join(root, f) for f in fns if f.endswith(tuple(exts))]
                if not recursive:
                    break
    return files


def get_unet_te_pairs(files):
    """Pair unet-*/text_encoder-* files by shared suffix
    (reference batch_hcp_convert.py:427-456)."""
    pairs = defaultdict(lambda: {"unet": None, "TE": None})
    for f in files:
        base = os.path.basename(f)
        name, _ = os.path.splitext(base)
        if name.startswith("unet-"):
            pairs[name[len("unet-"):]]["unet"] = f
        elif name.startswith("text_encoder-"):
            pairs[name[len("text_encoder-"):]]["TE"] = f
    return pairs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("direction", choices=["to_webui", "from_webui"])
    parser.add_argument("--src", nargs="+", required=True)
    parser.add_argument("--dst_dir", required=True)
    parser.add_argument("--network_type", default="lora", choices=["lora", "plugin"])
    parser.add_argument("--sdxl", action="store_true")
    parser.add_argument("--auto_scale_alpha", action="store_true")
    parser.add_argument("--save_fp16", action="store_true")
    parser.add_argument("--recursive", action="store_true")
    args = parser.parse_args()

    import numpy as np
    from safetensors.numpy import save_file

    from lycoris_tpu.utils.hcp_convert import LoraConverter
    from lycoris_tpu.wrapper import load_file_sd

    os.makedirs(args.dst_dir, exist_ok=True)
    conv = LoraConverter(save_fp16=args.save_fp16)
    files = gather(args.src, recursive=args.recursive)

    def save(sd, path):
        save_file({k: np.ascontiguousarray(np.asarray(v)) for k, v in sd.items()}, path)

    if args.direction == "to_webui":
        for suffix, pair in get_unet_te_pairs(files).items():
            sd_unet = load_file_sd(pair["unet"]) if pair["unet"] else {}
            sd_te = load_file_sd(pair["TE"]) if pair["TE"] else {}
            out = conv.convert_to_webui(
                sd_unet, sd_te, args.network_type, args.auto_scale_alpha, args.sdxl
            )
            path = os.path.join(args.dst_dir, f"webui-{suffix}.safetensors")
            save(out, path)
            print(f"saved {path} ({len(out)} tensors)")
    else:
        for f in files:
            state = load_file_sd(f)
            sd_unet, sd_te = conv.convert_from_webui(
                state, args.network_type, args.auto_scale_alpha, args.sdxl
            )
            name = os.path.splitext(os.path.basename(f))[0]
            p1 = os.path.join(args.dst_dir, f"unet-{name}.safetensors")
            p2 = os.path.join(args.dst_dir, f"text_encoder-{name}.safetensors")
            save(sd_unet[args.network_type], p1)
            save(sd_te[args.network_type], p2)
            print(f"saved {p1} / {p2}")


if __name__ == "__main__":
    main()
