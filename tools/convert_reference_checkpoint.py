"""Convert a reference-released traversability-head checkpoint (.pt)
to this framework's quick_start payload format.

The reference ships trained heads under `assets/checkpoints/*.pt`
(consumed by /root/reference/quick_start.py:141-150): a torch
`state_dict` of `model.SimpleMLP` (`layers.<i>.weight/bias`, ReLU
slots skipping indices) with one extra non-module key,
`confidence_generator` = {"mean", "std", "var"} (0-d torch tensors).
This tool maps that onto our flax `SimpleMLP` (Dense_i kernels are the
transposed torch weights) and a `ConfidenceState`, and writes the
pickle payload `{"params", "cg_state", "step"}` that `quick_start.py
--ckpt` and the runtime's checkpoint loader consume.

The conversion is exact (a transpose is lossless), so a converted
released checkpoint reproduces the reference head's outputs to fp32
rounding — tested round-trip against a live torch forward in
tests/test_tools_and_utils.py.

Usage:
  python tools/convert_reference_checkpoint.py in.pt out.ckpt \
      [--no-reconstruction]

The MLP architecture (input size, hidden sizes, reconstruction flag)
is inferred from the weight shapes: reconstruction means the last
layer's width exceeds the traversability outputs by input_size
(simple_mlp.py:21-22 adds input_size to hidden_sizes[-1]).
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def convert_state_dict(sd, reconstruction: bool | None = None):
    """torch-style state dict -> (SimpleMLP module, flax params,
    ConfidenceState). `sd` maps `layers.<i>.weight/bias` to arrays
    (torch tensors or numpy) and may carry a `confidence_generator`
    dict. reconstruction=None infers it from the last layer's width."""
    import numpy as np

    from wild_visual_navigation_tpu.models import SimpleMLP
    from wild_visual_navigation_tpu.utils.confidence_generator import confidence_init

    def to_np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t, np.float32)

    idx = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("layers.") and k.endswith(".weight")}
    )
    if not idx:
        raise ValueError("no layers.<i>.weight keys — not a reference SimpleMLP state dict")
    Ws = [to_np(sd[f"layers.{i}.weight"]) for i in idx]  # torch Linear: (out, in)
    bs = [to_np(sd[f"layers.{i}.bias"]) for i in idx]
    input_size = Ws[0].shape[1]
    last_out = Ws[-1].shape[0]
    if reconstruction is None:
        reconstruction = last_out > input_size
    nr_sigmoid = last_out - (input_size if reconstruction else 0)
    if nr_sigmoid < 1:
        raise ValueError(
            f"inferred {nr_sigmoid} traversability outputs from last width {last_out} / "
            f"input {input_size}; pass --no-reconstruction if this head has none"
        )
    hidden_sizes = [W.shape[0] for W in Ws[:-1]] + [nr_sigmoid]

    mlp = SimpleMLP(
        input_size=input_size, hidden_sizes=tuple(hidden_sizes), reconstruction=reconstruction
    )
    params = {
        "params": {
            f"Dense_{j}": {"kernel": W.T.copy(), "bias": b.copy()}
            for j, (W, b) in enumerate(zip(Ws, bs))
        }
    }

    cg_state = confidence_init()
    cg = sd.get("confidence_generator")
    if cg is not None:
        import jax.numpy as jnp

        cg_state = cg_state._replace(
            mean=jnp.float32(float(to_np(cg["mean"]))),
            std=jnp.float32(float(to_np(cg["std"]))),
            var=jnp.float32(float(to_np(cg["var"]))),
        )
    return mlp, params, cg_state


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    ap.add_argument("input", help="reference .pt checkpoint (torch state dict)")
    ap.add_argument("output", help="output .ckpt (quick_start payload)")
    ap.add_argument("--no-reconstruction", dest="reconstruction", action="store_false",
                    default=None, help="force a head without reconstruction outputs")
    args = ap.parse_args(argv)

    import torch
    from flax import serialization

    sd = torch.load(args.input, map_location="cpu")
    mlp, params, cg_state = convert_state_dict(sd, reconstruction=args.reconstruction)
    payload = {
        "params": serialization.to_bytes(params),
        "cg_state": serialization.to_bytes(cg_state),
        "step": int(sd.get("step", 0)) if not hasattr(sd.get("step", 0), "detach") else 0,
        "arch": {
            "input_size": mlp.input_size,
            "hidden_sizes": list(mlp.hidden_sizes),
            "reconstruction": mlp.reconstruction,
        },
    }
    with open(args.output, "wb") as f:
        pickle.dump(payload, f)
    print(
        f"wrote {args.output}: SimpleMLP(input_size={mlp.input_size}, "
        f"hidden_sizes={list(mlp.hidden_sizes)}, reconstruction={mlp.reconstruction})"
    )


if __name__ == "__main__":
    main()
