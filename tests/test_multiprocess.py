"""Multi-process (multi-host) smoke test: two OS processes join via
jax.distributed on CPU, form one global mesh, and run a psum + a sharded
train step — validating the coordination path the reference covers with
torch.distributed/NCCL launch (``tools/dist_train.sh``), here on JAX's
coordinator service.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(
        coordinator_address=sys.argv[1],
        num_processes=2, process_id=int(sys.argv[2]))
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()     # 2 local x 2
    assert len(jax.local_devices()) == 2

    mesh = Mesh(jax.devices(), ('data',))
    sharding = NamedSharding(mesh, P('data'))

    # global array from per-process shards
    local = jnp.full((2, 4), float(jax.process_index() + 1))
    garr = jax.make_array_from_process_local_data(sharding, local, (4, 4))

    @jax.jit
    def step(x):
        return (x ** 2).sum()

    total = step(garr)          # full-array reduction across processes
    expect = 2 * 4 * 1.0 + 2 * 4 * 4.0   # two rows of 1^2, two of 2^2
    assert float(total) == expect, float(total)
    print(f'proc{jax.process_index()} ok total={float(total)}', flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh(tmp_path):
    script = tmp_path / 'worker.py'
    script.write_text(WORKER)
    addr = f'127.0.0.1:{_free_port()}'
    env = dict(os.environ,
               XLA_FLAGS='--xla_force_host_platform_device_count=2',
               JAX_PLATFORMS='cpu')
    env.pop('JAX_COORDINATOR_ADDRESS', None)
    procs = [subprocess.Popen([sys.executable, str(script), addr, str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'proc{i} failed:\n{out}'
        assert f'proc{i} ok total=40.0' in out, out


# ---------------------------------------------------------------------------
# --launcher wiring (lednet_tpu/utils/dist.py)

DIST_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, sys.argv[3])
    import jax
    jax.config.update('jax_platforms', 'cpu')
    os.environ['MASTER_ADDR'], os.environ['MASTER_PORT'] = sys.argv[1].split(':')
    os.environ['WORLD_SIZE'] = '2'
    os.environ['RANK'] = sys.argv[2]
    from lednet_tpu.utils.dist import init_distributed
    init_distributed('pytorch')
    init_distributed('pytorch')   # idempotent second call
    assert jax.process_count() == 2, jax.process_count()
    print(f'proc{jax.process_index()} joined', flush=True)
""")


def test_launcher_pytorch_env_two_processes(tmp_path):
    script = tmp_path / 'dist_worker.py'
    script.write_text(DIST_WORKER)
    addr = f'127.0.0.1:{_free_port()}'
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               XLA_FLAGS='--xla_force_host_platform_device_count=2',
               JAX_PLATFORMS='cpu')
    procs = [subprocess.Popen(
        [sys.executable, str(script), addr, str(i), repo],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'proc{i} failed:\n{out}'
        assert f'proc{i} joined' in out, out


def test_launcher_noop_paths(monkeypatch):
    from lednet_tpu.utils.dist import init_distributed
    init_distributed('none')                      # no-op
    monkeypatch.setenv('WORLD_SIZE', '1')
    init_distributed('pytorch')                   # single process: no-op
    monkeypatch.setenv('SLURM_NTASKS', '1')
    init_distributed('slurm')                     # single-task slurm: no-op
