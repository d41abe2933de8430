

def test_trr_roundtrip(tmp_path):
    import mollytpu as mt
    from mollytpu.utils.trajectory import read_trr_frames
    import jax, jax.numpy as jnp, numpy as np

    boundary = mt.cubic(2.0)
    coords = mt.place_atoms(jax.random.PRNGKey(0), boundary, 10, min_dist=0.3)
    atoms = mt.make_atoms(n=10, mass=10.0, sigma=0.3, epsilon=0.2)
    vels = mt.random_velocities(jax.random.PRNGKey(1), atoms.mass, 100.0)
    sys = mt.System(atoms=atoms, coords=coords, boundary=boundary,
                    velocities=vels,
                    pairwise_inters=(mt.LennardJones(
                        cutoff=mt.DistanceCutoff(0.9)),))
    path = str(tmp_path / "traj.trr")
    traj = mt.TrajectoryWriter(2, path)
    final, _ = mt.simulate(sys, mt.VelocityVerlet(dt=0.001), 6,
                           loggers={"traj": traj})
    frames = read_trr_frames(path)
    assert frames.shape[0] >= 3 and frames.shape[1:] == (10, 3)
    assert np.allclose(frames[-1], np.asarray(final.coords), atol=1e-5)


def test_mol2_writer(tmp_path):
    import mollytpu as mt
    import jax, numpy as np

    boundary = mt.cubic(2.0)
    coords = mt.place_atoms(jax.random.PRNGKey(0), boundary, 5, min_dist=0.3)
    atoms = mt.make_atoms(n=5, mass=10.0, sigma=0.3, epsilon=0.2)
    sys = mt.System(atoms=atoms, coords=coords, boundary=boundary,
                    pairwise_inters=(mt.LennardJones(
                        cutoff=mt.DistanceCutoff(0.9)),))
    path = str(tmp_path / "frame.mol2")
    traj = mt.TrajectoryWriter(1, path)
    traj.observe(sys, None, {}, 0)
    text = open(path).read()
    assert "@<TRIPOS>MOLECULE" in text and text.count("\n") > 6


def test_visualize_gif(tmp_path):
    import mollytpu as mt
    import jax, numpy as np

    boundary = mt.cubic(2.0)
    coords = mt.place_atoms(jax.random.PRNGKey(0), boundary, 8, min_dist=0.3)
    frames = np.stack([np.asarray(coords) + 0.01 * t for t in range(3)])
    gif = mt.visualize(frames, str(tmp_path / "t.gif"), boundary=boundary,
                       size=64)
    data = open(gif, "rb").read()
    assert data[:6] == b"GIF89a" and data[-1:] == b"\x3B" and len(data) > 500
    ppm = mt.visualize(frames[-1], str(tmp_path / "t.ppm"), boundary=boundary,
                       size=64)
    assert open(ppm, "rb").read()[:2] == b"P6"


def test_xtc_roundtrip(tmp_path):
    import numpy as np
    from mollytpu.utils.xtc import (compress_coords, decompress_coords,
                                    write_xtc_frame, read_xtc_frames)
    rng = np.random.RandomState(3)
    # water-like clustered coords exercise the small-delta run encoding
    o = rng.uniform(0, 4.0, (500, 3))
    coords = np.stack([o, o + rng.normal(0, 0.03, o.shape) + 0.05,
                       o + rng.normal(0, 0.03, o.shape) - 0.05],
                      axis=1).reshape(-1, 3)
    minint, maxint, sidx, payload, *_ = compress_coords(coords, 1000.0)
    out = decompress_coords(coords.shape[0], minint, maxint, sidx, payload,
                            1000.0)
    assert np.max(np.abs(out - np.rint(coords * 1000.0) / 1000.0)) == 0.0
    assert len(payload) < coords.size * 4 * 0.5  # actually compresses

    path = tmp_path / "t.xtc"
    with open(path, "wb") as fh:
        write_xtc_frame(fh, coords, np.eye(3) * 4.0, 7, 0.25)
        write_xtc_frame(fh, coords + 0.01, np.eye(3) * 4.0, 8, 0.26)
    frames = read_xtc_frames(str(path))
    assert len(frames) == 2
    assert frames[0][2] == 7 and abs(frames[0][3] - 0.25) < 1e-6
    assert np.max(np.abs(frames[1][0]
                         - np.rint((coords + 0.01) * 1000) / 1000)) < 1e-9


def test_xtc_trajectory_writer(tmp_path):
    import jax, numpy as np
    import jax.numpy as jnp
    import mollytpu as mt
    from mollytpu.utils.trajectory import TrajectoryWriter, read_xtc_coords
    n = 64
    boundary = mt.cubic(3.0, dtype=jnp.float64)
    coords = jax.random.uniform(jax.random.PRNGKey(0), (n, 3),
                                minval=0.0, maxval=3.0, dtype=jnp.float64)
    atoms = mt.make_atoms(n=n, mass=1.0, sigma=0.2, epsilon=0.1,
                          dtype=jnp.float64)
    sys = mt.System(atoms=atoms, coords=coords, boundary=boundary,
                    velocities=jnp.zeros((n, 3), jnp.float64),
                    pairwise_inters=(mt.LennardJones(
                        cutoff=mt.DistanceCutoff(1.0)),))
    path = str(tmp_path / "traj.xtc")
    tw = TrajectoryWriter(1, path)
    tw.observe(sys, None, {}, 0)
    tw.observe(sys.update(coords=coords + 0.05), None, {}, 1)
    frames = read_xtc_coords(path)
    assert frames.shape == (2, n, 3)
    assert np.max(np.abs(frames[0] - np.asarray(coords))) < 6e-4
