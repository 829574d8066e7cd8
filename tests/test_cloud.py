

def test_pack_scan_roundtrip():
    """int16 fixed-point transfer packing (Cloud.pack_scan/from_packed):
    4 mm quantization, intensity at 1/1000, prefix-valid mask."""
    import numpy as np
    import jax.numpy as jnp

    from tloam_tpu.cloud import Cloud

    rng = np.random.default_rng(0)
    xyz = rng.uniform(-120, 120, size=(1000, 3)).astype(np.float32)
    inten = rng.uniform(0, 1, size=1000).astype(np.float32)
    q, n = Cloud.pack_scan(xyz, inten, capacity=1024)
    assert q.dtype == np.int16 and q.shape == (1024, 4) and n == 1000
    c = Cloud.from_packed(jnp.asarray(q), jnp.asarray(n))
    assert int(c.valid.sum()) == 1000
    assert np.abs(np.asarray(c.xyz[:1000]) - xyz).max() <= Cloud.PACK_SCALE / 2 + 1e-4
    assert np.abs(np.asarray(c.intensity[:1000]) - inten).max() <= 5.1e-4
