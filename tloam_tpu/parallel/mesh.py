"""Device-mesh construction + sharding helpers.

The TPU-native replacement for the reference's process/communication layer
(reference: ROS nodelet manager + TCPROS topics, launch/tloam_kitti.launch:8-31,
SURVEY.md §2.4). Instead of three threads passing clouds through queues, work
is laid out over a `jax.sharding.Mesh` and XLA inserts ICI/DCN collectives.

Two mesh axes cover this problem class (SURVEY.md §2.3 — no TP/PP analogue
is warranted for a 6-parameter state):
  * "frames": data parallelism over scan frames / sequence windows
    (BASELINE configs 3-5).
  * "points": within-frame sharding of correspondence buffers for the
    consensus psum Schur reduction (parallel.distributed).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def bootstrap_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """Multi-host bootstrap: `jax.distributed.initialize` wrapper.

    The TPU-native counterpart of the reference's ROS master + nodelet
    manager process bootstrap (launch/tloam_kitti.launch:8-18): after this,
    `jax.devices()` spans every host's chips and sharded programs reduce
    over DCN/ICI transparently. On Cloud TPU all arguments come from the
    metadata server (call with no args); elsewhere pass coordinator
    "host:port" + process counts, or set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID. Idempotent: repeated calls no-op.
    """
    if jax._src.distributed.global_state.client is not None:  # already up
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def process_frame_range(n_frames: int) -> tuple[int, int]:
    """Per-host input sharding: the contiguous [start, stop) slice of the
    frame stream this process should read (the counterpart of the
    reference's single reader nodelet feeding one process)."""
    p = jax.process_count()
    i = jax.process_index()
    per = (n_frames + p - 1) // p
    return i * per, min((i + 1) * per, n_frames)


def make_mesh(
    n_devices: int | None = None,
    frames: int | None = None,
    axis_names: tuple[str, str] = ("frames", "points"),
) -> Mesh:
    """Build a (frames, points) mesh over the available devices.

    With `frames` unset the whole device set is one frame-parallel axis
    (points axis of size 1); pass `frames` to split (e.g. frames=4 on 8
    devices -> 4x2: four frame groups, each psum-reducing over 2 shards).
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    f = frames or n
    assert n % f == 0, f"{n} devices not divisible into {f} frame groups"
    arr = np.asarray(devs).reshape(f, n // f)
    return Mesh(arr, axis_names)


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-of-frames arrays: leading axis over the frames mesh axis."""
    return NamedSharding(mesh, P("frames"))


def point_sharding(mesh: Mesh) -> NamedSharding:
    """Per-frame point buffers sharded over the points axis."""
    return NamedSharding(mesh, P(None, "points"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_cloud_points(tree, mesh: Mesh):
    """Place a FeatureSet/Cloud pytree with point axes sharded over the
    'points' mesh axis (leaf rank 1 -> P('points'), rank 2 -> P('points',
    None))."""

    def place(x):
        if x.ndim == 1:
            s = NamedSharding(mesh, P("points"))
        else:
            s = NamedSharding(mesh, P("points", *([None] * (x.ndim - 1))))
        return jax.device_put(x, s)

    return jax.tree.map(place, tree)
