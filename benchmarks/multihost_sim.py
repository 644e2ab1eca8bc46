"""Multi-host (DCN) simulation: two LOCAL processes over loopback.

``parallel.initialize_multihost`` wires ``jax.distributed.initialize``
(the DCN entry point, SURVEY.md section 5 distributed-backend row) but no
multi-host hardware exists here — this script executes it for real in
simulation: two processes, each contributing 2 virtual CPU devices, form
one 4-device global runtime over a loopback coordinator; process 0 builds
a global ``data`` mesh, assembles a globally-sharded batch with
``jax.make_array_from_process_local_data``, and runs ONE data-parallel
train step (loss + grads + Adam) of the flagship model. The parent then
reruns the identical step single-process on 4 local devices and asserts
the loss and a parameter checksum match.

Run: python benchmarks/multihost_sim.py
Committed log: benchmarks/logs/multihost_sim_r04.log
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PROC = 2
DEV_PER_PROC = 2


def _step_result():
    """Build the tiny flagship model and run one DP train step over
    whatever 4-device 'data' mesh the current runtime provides; returns
    (loss, params_checksum). Identical code in both the distributed
    children and the single-process reference."""
    import jax
    import jax.numpy as jnp
    import optax

    import pyroved_tpu as pv
    from pyroved_tpu.parallel import create_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = create_mesh({"data": N_PROC * DEV_PER_PROC})
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))

    model = pv.models.iVAE((8, 8), latent_dim=2, invariances=["r"], seed=1)
    params = jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(repl, np.asarray(a)),
        model.params)

    # every process holds the full batch; shard rows over 'data'
    x_full = np.random.default_rng(0).uniform(
        0, 1, (16, 8, 8)).astype(np.float32)
    nloc = x_full.shape[0] // jax.process_count()
    local_rows = x_full[jax.process_index() * nloc:
                        (jax.process_index() + 1) * nloc]
    x = jax.make_array_from_process_local_data(dp, local_rows)

    opt = optax.adam(1e-3)
    opt_state = jax.jit(opt.init, out_shardings=repl)(params)
    beta = jnp.float32(1.0)
    rng = jax.random.PRNGKey(7)

    def step(params, opt_state, rng, x):
        def f(p):
            return jnp.sum(model.loss_fn(p, rng, (x,), beta))
        loss, grads = jax.value_and_grad(f)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    with mesh:
        params, opt_state, loss = jax.jit(
            step, in_shardings=(repl, repl, None, dp),
            out_shardings=(repl, repl, None))(params, opt_state, rng, x)
    checksum = float(sum(jnp.sum(jnp.abs(l)).item()
                         for l in jax.tree_util.tree_leaves(params)))
    return float(loss), checksum


def _force_cpu(n_devices: int) -> None:
    # the axon TPU plugin OVERRIDES the JAX_PLATFORMS env var; forcing the
    # CPU backend must happen via jax.config before any device op
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)


def child(port: int, pid: int) -> int:
    _force_cpu(DEV_PER_PROC)
    import jax
    from pyroved_tpu.parallel import initialize_multihost

    n = initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                             num_processes=N_PROC, process_id=pid)
    assert n == N_PROC * DEV_PER_PROC, f"global devices {n}"
    assert len(jax.local_devices()) == DEV_PER_PROC
    assert jax.process_count() == N_PROC
    loss, checksum = _step_result()
    print("CHILD " + json.dumps({"pid": pid, "global_devices": n,
                                 "loss": loss, "checksum": checksum}),
          flush=True)
    return 0


def single_process_reference():
    _force_cpu(N_PROC * DEV_PER_PROC)
    loss, checksum = _step_result()
    return loss, checksum


def main() -> int:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        return child(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
    if "--ref" in sys.argv:
        loss, checksum = single_process_reference()
        print("REF " + json.dumps({"loss": loss, "checksum": checksum}),
              flush=True)
        return 0

    with socket.socket() as s:  # pick a free loopback port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count="
                          f"{DEV_PER_PROC}")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", str(port),
         str(i)], env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(N_PROC)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        if p.returncode != 0:
            print(out + err)
            return 1
        outs.append(out)

    child_recs = [json.loads(l[len("CHILD "):]) for o in outs
                  for l in o.splitlines() if l.startswith("CHILD ")]
    assert len(child_recs) == N_PROC, outs
    assert all(r["global_devices"] == N_PROC * DEV_PER_PROC
               for r in child_recs)
    # both processes computed the same global step
    assert abs(child_recs[0]["loss"] - child_recs[1]["loss"]) < 1e-6

    # single-process reference: same step on 4 LOCAL devices
    env_ref = dict(env)
    env_ref["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count="
                              f"{N_PROC * DEV_PER_PROC}")
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--ref"],
        env=env_ref, capture_output=True, text=True, timeout=900)
    ref = json.loads([l for l in p.stdout.splitlines()
                      if l.startswith("REF ")][-1][len("REF "):])

    dl = abs(child_recs[0]["loss"] - ref["loss"]) / abs(ref["loss"])
    dc = abs(child_recs[0]["checksum"] - ref["checksum"]) / ref["checksum"]
    print(f"multihost loss={child_recs[0]['loss']:.6f} "
          f"ref={ref['loss']:.6f} rel={dl:.2e}")
    print(f"multihost checksum={child_recs[0]['checksum']:.6f} "
          f"ref={ref['checksum']:.6f} rel={dc:.2e}")
    assert dl < 1e-6 and dc < 1e-6, (child_recs, ref)
    print("MULTIHOST_SIM_OK: 2 processes x 2 devices over loopback == "
          "single-process 4-device step")
    return 0


if __name__ == "__main__":
    sys.exit(main())
