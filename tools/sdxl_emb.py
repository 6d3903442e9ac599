"""Make a textual-inversion embedding from token ids / text (SDXL format).

Reference: tools/sdxl_emb.py:42-66 — picks rows from the two CLIP text-model
token-embedding tables (clip_l 768d + clip_g 1280d) and saves them under the
``clip_l``/``clip_g`` keys A1111 expects.

This version reads the embedding tables directly from text-encoder
state-dict checkpoints (no model instantiation); pass token ids, or text
plus a local tokenizer directory (zero-egress environments can't download).

Usage:
  python tools/sdxl_emb.py --te1 te1.safetensors --te2 te2.safetensors \
      --ids 320 1125 --output my_emb.safetensors
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def find_embedding_table(sd, hints=("token_embedding", "embeddings.token_embedding", "tok_embeddings")):
    for k, v in sd.items():
        if any(h in k for h in hints) and getattr(v, "ndim", 0) == 2:
            return v
    raise KeyError(f"no token embedding table found; keys: {list(sd)[:5]}...")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--te1", required=True, help="clip_l text encoder checkpoint")
    parser.add_argument("--te2", default=None, help="clip_g text encoder checkpoint (SDXL)")
    parser.add_argument("--ids", type=int, nargs="*", default=None, help="token ids")
    parser.add_argument("--text", default=None)
    parser.add_argument("--tokenizer", default=None, help="local tokenizer dir (for --text)")
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    import numpy as np
    from safetensors.numpy import save_file

    from lycoris_tpu.wrapper import load_file_sd

    ids = args.ids
    if ids is None:
        assert args.text and args.tokenizer, "pass --ids, or --text with --tokenizer"
        from transformers import CLIPTokenizer

        tok = CLIPTokenizer.from_pretrained(args.tokenizer)
        ids = tok(args.text)["input_ids"][1:-1]  # strip BOS/EOS
    ids = np.asarray(ids, np.int64)

    emb = {}
    table1 = np.asarray(find_embedding_table(load_file_sd(args.te1)))
    emb["clip_l"] = np.ascontiguousarray(table1[ids])
    if args.te2:
        table2 = np.asarray(find_embedding_table(load_file_sd(args.te2)))
        emb["clip_g"] = np.ascontiguousarray(table2[ids])

    save_file(emb, args.output)
    shapes = {k: v.shape for k, v in emb.items()}
    print(f"saved {args.output}: {shapes}")


if __name__ == "__main__":
    main()
