"""Batch pack/unpack LoRA<->bundle files (webui bundle format).

Reference: tools/batch_bundle_convert.py. Pairs {name}-{step}.{ext} files.
Usage:
  python tools/batch_bundle_convert.py pack   --lora_path P [...] --emb_path E [...] --dst_dir D
  python tools/batch_bundle_convert.py unpack --lora_path P [...] --dst_dir D
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def gather(paths, exts, recursive=False):
    files = []
    for p in paths:
        if os.path.isfile(p) and any(p.endswith(e) for e in exts):
            files.append(p)
        elif os.path.isdir(p):
            for root, _, fns in os.walk(p):
                files += [os.path.join(root, f) for f in fns if any(f.endswith(e) for e in exts)]
                if not recursive:
                    break
    return files


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("action", choices=["pack", "unpack"])
    parser.add_argument("--lora_path", nargs="+", required=True)
    parser.add_argument("--emb_path", nargs="*", default=[])
    parser.add_argument("--dst_dir", required=True)
    parser.add_argument("--recursive", action="store_true")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    import numpy as np
    from safetensors.numpy import save_file

    from lycoris_tpu.utils.bundle import (
        extract_step,
        pack_bundle,
        pair_loras_with_embeddings,
        unpack_bundle,
    )
    from lycoris_tpu.wrapper import load_file_sd

    os.makedirs(args.dst_dir, exist_ok=True)
    exts = [".safetensors", ".pt"]
    lora_files = gather(args.lora_path, exts, args.recursive)

    def save(sd, path):
        save_file({k: np.ascontiguousarray(np.asarray(v)) for k, v in sd.items()}, path)

    if args.action == "pack":
        emb_files = gather(args.emb_path, exts, args.recursive)
        pairs = pair_loras_with_embeddings(lora_files, emb_files)
        for step, pair in pairs.items():
            if pair["lora"] is None:
                continue
            lora_sd = load_file_sd(pair["lora"])
            embs = {
                extract_step(e)[0]: load_file_sd(e) for e in pair["embs"]
            }
            lora_sd = pack_bundle(lora_sd, embs, args.verbose)
            name, st = extract_step(pair["lora"])
            suffix = f"-{st}" if st != "" else ""
            out = os.path.join(args.dst_dir, f"{name}-bundle{suffix}.safetensors")
            save(lora_sd, out)
            print(f"packed {out}")
    else:
        for lf in lora_files:
            lora_sd = load_file_sd(lf)
            name, st = extract_step(lf)
            lora_sd, embs = unpack_bundle(lora_sd, args.verbose, step=st, emb_format=".safetensors")
            suffix = f"-{st}" if st != "" else ""
            if name.endswith("-bundle"):
                name = name[:-7]
            save(lora_sd, os.path.join(args.dst_dir, f"{name}{suffix}.safetensors"))
            for emb, emb_sd in embs.items():
                save(emb_sd, os.path.join(args.dst_dir, f"{emb}.safetensors"))
            print(f"unpacked {lf}: {len(embs)} embeddings")


if __name__ == "__main__":
    main()
