"""Time the fused FFT block kernel as currently in the working tree."""
import time, functools, jax, numpy as np
import jax.numpy as jnp
import bench
cfg = bench._setup()
from seq2squiggle_tpu.profiles import get_profile, update_config_for_profile
from seq2squiggle_tpu.runtime.simulate import resolve_weights
from seq2squiggle_tpu.ops.pallas.fft_block import fused_fft_block

profile = 'dna-r10-prom'
config = update_config_for_profile(profile, cfg)
params, _ = resolve_weights(bench._weights(), config, 42, profile)
n_head = int(config['decoder_heads'])
dev = jax.devices()[0]
P = jax.device_put(params, dev)
blk = P['decoder']['blocks'][0]
B, T, D = 2048, 250, 64
x0 = jax.device_put(jnp.asarray(
    np.random.default_rng(0).standard_normal((B, T, D)) * 0.1, jnp.bfloat16), dev)
f = jax.jit(lambda x: fused_fft_block(x, blk, n_head))
probe = jax.jit(lambda o: o[0, 0, 0])

def t_of(n):
    t0 = time.perf_counter()
    x = x0
    for _ in range(n):
        x = f(x)
    np.asarray(probe(x))
    return time.perf_counter() - t0

a = f(x0)
print('sample out', np.asarray(a[:1, :1, :4]).astype(np.float32), flush=True)
t1 = t_of(1); t33 = t_of(33); t33b = t_of(33)
ms = min(t33 - t1, t33b - t1) / 32 * 1e3
print(f'block: {ms:.3f} ms (B={B}, slope method, best of 2)', flush=True)
