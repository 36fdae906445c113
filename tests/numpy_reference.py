"""Independent NumPy implementation of the model math, used as the golden
oracle for the JAX model. Written directly from the architecture spec
(post-LN feed-forward transformer; see SURVEY.md section 3.5), sharing no
code with the JAX implementation."""

import numpy as np


def np_linear(p, x):
    return x @ p["kernel"] + p["bias"]


def np_layer_norm(p, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * p["scale"] + p["bias"]


def np_softmax(x):
    m = x.max(-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(-1, keepdims=True)


def np_attention(p, x, n_head):
    B, L, D = x.shape
    d_k = D // n_head
    q = np_linear(p["w_qs"], x).reshape(B, L, n_head, d_k)
    k = np_linear(p["w_ks"], x).reshape(B, L, n_head, d_k)
    v = np_linear(p["w_vs"], x).reshape(B, L, n_head, d_k)
    out = np.empty_like(q)
    for h in range(n_head):
        attn = q[:, :, h] @ k[:, :, h].transpose(0, 2, 1) / np.sqrt(d_k)
        out[:, :, h] = np_softmax(attn) @ v[:, :, h]
    out = out.reshape(B, L, D)
    out = np_linear(p["fc"], out)
    return np_layer_norm(p["ln"], out + x)


def np_ffn(p, x):
    h = np.maximum(np_linear(p["w_1"], x), 0)
    out = np_linear(p["w_2"], h)
    return np_layer_norm(p["ln"], out + x)


def np_fft_block(p, x, n_head):
    return np_ffn(p["ffn"], np_attention(p["attn"], x, n_head))


def np_encoder(params, one_hot, config):
    enc = params["encoder"]
    x = np.maximum(np_linear(enc["src_emb"], one_hot), 0)
    for pre in enc["pre_net"]:
        x = np.maximum(np_linear(pre, x), 0)
    emb = x
    h = x + enc["pos_enc"][None, : x.shape[1]]
    for block in enc["blocks"]:
        h = np_fft_block(block, h, config["encoder_heads"])
    return h, emb


def np_decoder(params, x, config):
    dec = params["decoder"]
    h = x + dec["pos_enc"][None, : x.shape[1]]
    for block in dec["blocks"]:
        h = np_fft_block(block, h, config["decoder_heads"])
    return np.maximum(np_linear(dec["out_linear"], h), 0)


def np_softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)


def np_mlp_head(p, x):
    h = np.maximum(np_linear(p["fc1"], x), 0)
    return np_softplus(np_linear(p["fc2"], h))[..., 0]


def np_length_regulate(x, durations, max_len):
    """Reference algorithm: cumsum -> step masks -> diff -> bmm, then
    pad/truncate to max_len (reference modules.py:344-392 semantics)."""
    B, K = durations.shape
    cum = np.cumsum(durations, axis=1)
    T_dyn = int(cum.max())
    ids = np.arange(T_dyn)
    M = (ids[None, None, :] < cum[:, :, None]).astype(np.float64)  # (B,K,T)
    M = np.diff(M, axis=1, prepend=np.zeros((B, 1, T_dyn)))
    out_dyn = np.einsum("bkt,bkd->btd", M, x)
    D = x.shape[-1]
    out = np.zeros((B, max_len, D), x.dtype)
    t = min(T_dyn, max_len)
    out[:, :t] = out_dyn[:, :t]
    return out
