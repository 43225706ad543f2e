#!/usr/bin/env python
# coding: utf-8
"""Convert checkpoints between the reference (PyTorch) format and ours.

torch -> native:
    python scripts/convert_checkpoint.py torch_model.ckpt native.ckpt

native -> torch state_dict (for loading back into the reference):
    python scripts/convert_checkpoint.py native.ckpt torch_model.ckpt --to-torch

The torch->native direction maps every parameter by name (kernels
transposed, convs re-laid-out; joeys2t_tpu/convert.py) so published
JoeyS2T/JoeyNMT models run here unchanged.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, Path(__file__).parent.parent.as_posix())


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="input checkpoint")
    ap.add_argument("dst", help="output checkpoint")
    ap.add_argument("--allow-pickle", action="store_true",
                    help="permit full unpickling of the torch checkpoint "
                         "(unsafe for untrusted files)")
    ap.add_argument("--to-torch", action="store_true",
                    help="convert a native checkpoint to a torch state_dict "
                         "(requires torch; default is torch -> native)")
    args = ap.parse_args()

    if args.to_torch:
        import torch

        from joeys2t_tpu.checkpoints import load_checkpoint
        from joeys2t_tpu.convert import flax_to_torch_state_dict

        ckpt = load_checkpoint(args.src)
        sd = {k: torch.from_numpy(v.copy())
              for k, v in flax_to_torch_state_dict(ckpt["model_state"]).items()}
        torch.save({"model_state": sd}, args.dst)
        print(f"wrote torch checkpoint with {len(sd)} tensors -> {args.dst}")
    else:
        from joeys2t_tpu.checkpoints import save_checkpoint
        from joeys2t_tpu.convert import load_torch_checkpoint

        ckpt = load_torch_checkpoint(args.src, allow_pickle=args.allow_pickle)
        save_checkpoint(Path(args.dst), ckpt)
        import jax

        n = len(jax.tree.leaves(ckpt["model_state"]))
        print(f"wrote native checkpoint with {n} tensors -> {args.dst}")


if __name__ == "__main__":
    main()
