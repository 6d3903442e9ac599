"""Pack textual-inversion embeddings into a LoRA file (webui bundle format).

Reference: tools/pack_bundle.py. Usage:
  python tools/pack_bundle.py <lora.safetensors> <emb1> [emb2 ...] [-o out]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("lora_model")
    parser.add_argument("embeddings", nargs="+")
    parser.add_argument("-o", "--output", default=None)
    args = parser.parse_args()

    import numpy as np
    from safetensors.numpy import save_file

    from lycoris_tpu.utils.bundle import pack_bundle
    from lycoris_tpu.wrapper import load_file_sd

    lora_sd = load_file_sd(args.lora_model)
    embs = {
        os.path.splitext(os.path.basename(x))[0]: load_file_sd(x) for x in args.embeddings
    }
    lora_sd = pack_bundle(lora_sd, embs, verbose=True)

    out = args.output or f"{os.path.splitext(args.lora_model)[0]}_bundle.safetensors"
    save_file({k: np.ascontiguousarray(np.asarray(v)) for k, v in lora_sd.items()}, out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
