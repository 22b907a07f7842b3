"""Worker for the multi-process SPMD integration test (launched as a
subprocess by tests/test_multihost.py; not itself a test module).

Trains a tiny Tacotron for a few steps over a ('data','model') mesh. With
num_processes>1 it connects via `jax.distributed.initialize()` (through
`multihost.initialize_from_env`) so 2 processes × 4 virtual CPU devices form
one 8-device SPMD program — the TPU-native equivalent of the reference's
gloo/NCCL DDP (`/root/reference/models/synthesizer/train_vits.py:126-171`).
Prints the per-step losses as one JSON line, which must match the
single-process 8-device run exactly.
"""
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    cfg = json.loads(sys.argv[1])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={cfg['local_devices']}")
    if cfg["num_processes"] > 1:
        os.environ["MB_COORDINATOR"] = f"localhost:{cfg['port']}"
        os.environ["MB_NUM_PROCESSES"] = str(cfg["num_processes"])
        os.environ["MB_PROCESS_ID"] = str(cfg["process_id"])

    import jax
    # the axon TPU plugin can override JAX_PLATFORMS; force the CPU backend
    # the way tests/conftest.py does
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mockingbird_tpu.parallel import multihost
    multihost.initialize_from_env()

    from mockingbird_tpu.models.tacotron.model import init_tacotron, tacotron_config
    from mockingbird_tpu.models.tacotron.train import make_train_step
    from mockingbird_tpu.parallel.mesh import make_mesh, shard_batch

    assert len(jax.devices()) == 8, jax.devices()
    assert jax.process_count() == cfg["num_processes"]

    tcfg = tacotron_config().merge(dict(
        embed_dims=32, encoder_dims=16, decoder_dims=32, postnet_dims=16,
        encoder_K=2, lstm_dims=32, postnet_K=2, num_highways=2,
        speaker_embedding_size=16, use_gst=False))
    model, variables = init_tacotron(jax.random.PRNGKey(0), tcfg)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    mesh = make_mesh()
    params, stats, opt = multihost.make_global(mesh, (params, stats, opt))
    step_fn = make_train_step(model, tx, 2)

    # identical global batch on every process (same seed)
    rng = np.random.RandomState(0)
    b, t_text, t_mel = 8, 12, 16
    batch = dict(
        texts=rng.randint(1, 40, (b, t_text)).astype(np.int32),
        mels=rng.randn(b, t_mel, 80).astype(np.float32),
        embeds=rng.randn(b, 16).astype(np.float32),
        stop=np.ones((b, t_mel), np.float32),
        mel_lengths=np.full((b,), t_mel, np.int32),
    )

    losses = []
    for i in range(3):
        sb = shard_batch(mesh, batch)
        (params, stats), opt, loss, parts, attn, post = step_fn(
            (params, stats), opt, sb, jax.random.PRNGKey(7))
        losses.append(float(loss))

    # the per-rank-local feeding path (BucketBatcher-style): each process
    # contributes only its own rows via assemble_local_batch; the resulting
    # global batch — and therefore the loss — must match shard_batch exactly
    n_proc = jax.process_count()
    rows = b // n_proc
    pid = jax.process_index()
    local = {k: v[pid * rows:(pid + 1) * rows] for k, v in batch.items()}
    ab = multihost.assemble_local_batch(mesh, local)
    # step_fn donates its inputs; copy state before each comparison run
    import jax.numpy as _jnp
    copy = lambda t: jax.tree.map(_jnp.copy, t)
    p1, s1, o1 = copy(params), copy(stats), copy(opt)
    (_, _), _, loss_a, *_ = step_fn((p1, s1), o1, ab, jax.random.PRNGKey(9))
    p2, s2, o2 = copy(params), copy(stats), copy(opt)
    sb = shard_batch(mesh, batch)
    (_, _), _, loss_g, *_ = step_fn((p2, s2), o2, sb, jax.random.PRNGKey(9))
    assert abs(float(loss_a) - float(loss_g)) < 1e-6, (float(loss_a), float(loss_g))

    if jax.process_index() == 0:
        print("LOSSES " + json.dumps(losses), flush=True)


if __name__ == "__main__":
    main()
