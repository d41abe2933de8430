

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


def test_xtc_run_persistence_semantics():
    """GROMACS/libxdrfile semantics: the per-base-atom flag bit means
    "run-length changed", NOT "a run follows". For a stream of identical
    run lengths the writer must emit flag=0 while still writing the run
    smallints, and the reader must persist the run across atoms.

    Walks the emitted bitstream independently to count flag=1 events: with
    correct semantics a constant-run stream has far fewer flag=1 events
    than base atoms (a writer that re-flags every run would emit one per
    base atom and be unreadable by GROMACS/VMD/MDAnalysis)."""
    import numpy as np
    from mollytpu.utils import xtc as X

    # rigid water-like triplets with IDENTICAL geometry -> constant run=6
    rng = np.random.RandomState(0)
    o = rng.uniform(0.5, 3.5, (200, 3))
    d1 = np.array([0.06, 0.02, -0.01])
    d2 = np.array([-0.03, 0.05, 0.04])
    coords = np.stack([o, o + d1, o + d2], axis=1).reshape(-1, 3)
    n = coords.shape[0]
    minint, maxint, sidx, payload, bitsize, bitsizeint, sizeint = \
        X.compress_coords(coords, 1000.0)

    # independent walk of the stream, mirroring libxdrfile's reader control
    # flow, counting flag events
    r = X._BitReader(payload)
    smallidx = sidx
    sizesmall = [X.MAGICINTS[smallidx]] * 3
    smaller = X.MAGICINTS[max(X.FIRSTIDX, smallidx - 1)] // 2
    smallnum = X.MAGICINTS[smallidx] // 2
    i = 0
    run = 0
    n_flags = 0
    n_base = 0
    saw_flag0_with_run = False
    while i < n:
        if bitsize == 0:
            for d in range(3):
                r.bits(bitsizeint[d])
        else:
            r.ints(bitsize, sizeint)
        n_base += 1
        flag = r.bits(1)
        is_smaller = 0
        if flag:
            n_flags += 1
            v = r.bits(5)
            is_smaller = v % 3
            run = v - is_smaller
            is_smaller -= 1
        elif run > 0:
            saw_flag0_with_run = True
        i += 1
        for k in range(0, run, 3):
            r.ints(smallidx, sizesmall)
            i += 1
        if is_smaller:
            smallidx += is_smaller
            if is_smaller < 0:
                smallnum = smaller
                smaller = (X.MAGICINTS[smallidx - 1] // 2
                           if smallidx > X.FIRSTIDX else 0)
            else:
                smaller = smallnum
                smallnum = X.MAGICINTS[smallidx] // 2
            sizesmall = [X.MAGICINTS[smallidx]] * 3
    assert i == n
    assert saw_flag0_with_run, "writer never persisted a run under flag=0"
    assert n_flags < n_base // 2

    # and the reader round-trips that stream exactly
    out = X.decompress_coords(n, minint, maxint, sidx, payload, 1000.0)
    assert np.array_equal(np.rint(coords * 1000.0), np.rint(out * 1000.0))


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
