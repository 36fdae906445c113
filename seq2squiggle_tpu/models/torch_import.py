"""Import pretrained reference checkpoints (torch Lightning .ckpt) into the
native parameter pytree, plus a simple .npz-based native checkpoint format.

The reference embeds its config via save_hyperparameters()
(src/seq2squiggle/model.py:46) and stores weights under a Lightning
state_dict with module names from model.py:47-50 (encoders, length_regulator,
decoders, noise_sampler). Mapping is pure transpose/reshape: torch Linear
weights are (out, in), ours are (in, out).
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger("seq2squiggle_tpu")


def _lin(sd: dict, name: str) -> dict:
    w = np.asarray(sd[f"{name}.weight"], np.float32)
    b = np.asarray(sd[f"{name}.bias"], np.float32)
    return {"kernel": w.T.copy(), "bias": b}


def _ln(sd: dict, name: str) -> dict:
    return {
        "scale": np.asarray(sd[f"{name}.weight"], np.float32),
        "bias": np.asarray(sd[f"{name}.bias"], np.float32),
    }


def _block(sd: dict, prefix: str) -> dict:
    return {
        "attn": {
            "w_qs": _lin(sd, f"{prefix}.slf_attn.w_qs"),
            "w_ks": _lin(sd, f"{prefix}.slf_attn.w_ks"),
            "w_vs": _lin(sd, f"{prefix}.slf_attn.w_vs"),
            "fc": _lin(sd, f"{prefix}.slf_attn.fc"),
            "ln": _ln(sd, f"{prefix}.slf_attn.layer_norm"),
        },
        "ffn": {
            "w_1": _lin(sd, f"{prefix}.pos_ffn.w_1"),
            "w_2": _lin(sd, f"{prefix}.pos_ffn.w_2"),
            "ln": _ln(sd, f"{prefix}.pos_ffn.layer_norm"),
        },
    }


def _mlp_head(sd: dict, prefix: str) -> dict:
    # torch Sequential(Linear, ReLU, Dropout, Linear, Softplus) -> 0 and 3.
    return {"fc1": _lin(sd, f"{prefix}.0"), "fc2": _lin(sd, f"{prefix}.3")}


def params_from_state_dict(sd: dict, config: dict) -> dict:
    """Map a reference state_dict (tensor or ndarray values) to our pytree."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    n_enc = config["encoder_layers"]
    n_dec = config["decoder_layers"]
    encoder = {
        "src_emb": _lin(sd, "encoders.src_emb"),
        "pre_net": [
            _lin(sd, f"encoders.pre_net_stack.{i}")
            for i in range(config["pre_layers"])
        ],
        "pos_enc": np.asarray(sd["encoders.position_enc"], np.float32)[0],
        "blocks": [_block(sd, f"encoders.layer_stack.{i}") for i in range(n_enc)],
    }
    decoder = {
        "pos_enc": np.asarray(sd["decoders.position_enc"], np.float32)[0],
        "blocks": [
            _block(sd, f"decoders.layer_stack_FFT.{i}") for i in range(n_dec)
        ],
        "out_linear": _lin(sd, "decoders.out_linear"),
    }
    noise = _mlp_head(sd, "noise_sampler.stdv_layer")
    duration = {
        "conc": _mlp_head(sd, "length_regulator.duration_sampler.conc_layer"),
        "rate": _mlp_head(sd, "length_regulator.duration_sampler.rate_layer"),
    }
    return {
        "encoder": encoder,
        "decoder": decoder,
        "noise_sampler": noise,
        "duration_sampler": duration,
    }


def load_torch_checkpoint(path: str) -> Tuple[dict, dict]:
    """Load a reference .ckpt; returns (params_pytree, checkpoint_config)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    hparams = ckpt.get("hyper_parameters", {})
    config = dict(hparams.get("config", {}))
    if not config:
        raise ValueError(
            f"{path} has no embedded config (hyper_parameters.config); "
            "pass a matching --config explicitly."
        )
    return params_from_state_dict(sd, config), config


# ---------------------------------------------------------------------------
# Native .npz checkpoints
# ---------------------------------------------------------------------------


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_native_checkpoint(path: str, params: dict, config: dict):
    """Save params + config to a single .npz file."""
    import json

    flat = _flatten(params)
    flat["__config__"] = np.frombuffer(
        json.dumps(config).encode("utf-8"), np.uint8
    )
    np.savez(path, **flat)


def load_native_checkpoint(path: str) -> Tuple[dict, dict]:
    import json

    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    config = json.loads(bytes(flat.pop("__config__")).decode("utf-8"))
    return _unflatten(flat), config


def load_checkpoint(path: str) -> Tuple[dict, dict]:
    """Dispatch on extension: .ckpt -> torch import, .npz -> native."""
    path = str(path)
    if path.endswith(".ckpt"):
        return load_torch_checkpoint(path)
    if path.endswith(".npz"):
        return load_native_checkpoint(path)
    raise ValueError(f"Unknown checkpoint format: {path} (expect .ckpt or .npz)")
