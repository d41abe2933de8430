

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
