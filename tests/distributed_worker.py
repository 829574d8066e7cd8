"""Worker process for the multi-process CPU loopback test (SURVEY §4's
prescribed fake-backend trick for exercising jax.distributed without real
hosts). Launched by test_distributed.py with:

    python distributed_worker.py <coordinator> <num_procs> <proc_id> <outdir>

Each process contributes 2 virtual CPU devices; the global mesh spans
num_procs*2 devices. The worker solves ONE consensus registration with the
scan sharded over the global "points" axis (psum Schur reduction over the
process boundary = the DCN path) and writes its result for the test to
compare against the single-process reference solve.
"""
import os
import sys

# must be set before jax import: 2 local CPU devices per process
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()
# keep the axon sitecustomize from pinning the tunneled TPU
os.environ.pop("JAX_PLATFORM_NAME", None)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, num_procs, proc_id, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "points"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from tloam_tpu.parallel import mesh as mesh_lib

    mesh_lib.bootstrap_distributed(coordinator, num_procs, proc_id)
    assert jax.process_count() == num_procs
    assert len(jax.devices()) == num_procs * 2, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tests.test_parallel import make_pair
    from tloam_tpu.config import TLSConfig
    from tloam_tpu.models.registration import scan_matching
    from tests.test_registration import CFG

    rng = np.random.default_rng(0)
    scan, submap, T_true = make_pair(rng, dtype=jnp.float64)

    n_dev = num_procs * 2

    if mode == "frames":
        # frames-axis data parallelism (SURVEY §2.3, VERDICT r3 missing #3):
        # a 4-frame batch sharded one frame per device across the process
        # boundary; per-frame solves are independent, so the only cross-host
        # traffic is the gathered outputs.
        mesh = Mesh(np.asarray(jax.devices()).reshape(n_dev), ("frames",))
        B = n_dev

        def batch(tree):
            return jax.tree.map(
                lambda x: np.broadcast_to(
                    np.asarray(x)[None], (B,) + np.asarray(x).shape
                ),
                tree,
            )

        b_scan, b_submap = batch(scan), batch(submap)
        b_predict = np.broadcast_to(np.eye(4)[None], (B, 4, 4))

        def globalize_frames(tree):
            def place(x):
                spec = P("frames", *([None] * (x.ndim - 1)))
                s = NamedSharding(mesh, spec)
                return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

            return jax.tree.map(place, tree)

        g = (globalize_frames(b_scan), globalize_frames(b_submap),
             globalize_frames(b_predict))

        @jax.jit
        def solve_frames(s, mm, p):
            pose, _ = jax.vmap(
                lambda sc, m_, pr: scan_matching(sc, m_, pr, CFG)
            )(s, mm, p)
            return pose

        poses = jax.block_until_ready(solve_frames(*g))
        # every device holds one frame's pose; fetch the locally-addressable
        # shards and tag them with their global frame index
        local = {
            int(sh.index[0].start): np.asarray(sh.data)[0]
            for sh in poses.addressable_shards
        }
        np.savez(os.path.join(outdir, f"frames_{proc_id}.npz"),
                 **{str(k): v for k, v in local.items()})
        print(f"proc {proc_id}: frames mode done", flush=True)
        return

    mesh = Mesh(np.asarray(jax.devices()).reshape(1, n_dev), ("frames", "points"))

    # build GLOBAL sharded arrays; every process holds the same full array
    # (identical seed), so each shard is cut from it by global index
    def globalize(tree, sharded: bool):
        def place(x):
            x = np.asarray(x)
            if sharded:
                spec = P("points", *([None] * (x.ndim - 1)))
            else:
                spec = P(*([None] * x.ndim))
            s = NamedSharding(mesh, spec)
            return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

        return jax.tree.map(place, tree)

    g_scan = globalize(scan, True)
    g_submap = globalize(submap, False)
    g_predict = globalize(jnp.eye(4, dtype=jnp.float64), False)

    from functools import partial

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda x: P("points", *([None] * (x.ndim - 1))), scan),
            jax.tree.map(lambda x: P(*([None] * x.ndim)), submap),
            P(None, None),
        ),
        out_specs=P(None, None),
        check_vma=False,
    )
    def solve(scan_local, submap_local, predict):
        pose, _ = scan_matching(scan_local, submap_local, predict, CFG,
                                axis_name="points")
        return pose

    pose = jax.block_until_ready(solve(g_scan, g_submap, g_predict))
    local = np.asarray(pose.addressable_data(0))
    np.save(os.path.join(outdir, f"pose_{proc_id}.npy"), local)
    print(f"proc {proc_id}: done", flush=True)


if __name__ == "__main__":
    main()
