"""Landmark table: association/update/filter vs the oracle's Mapa semantics."""
import numpy as np
import jax.numpy as jnp

from icm_slam_tpu.mapping import landmark_map as lm
from tests.oracle import reference_oracle as oracle

L = 64


def _run_pair(frames, p):
    """Feed identical world-point frames to oracle map and JAX map (online
    mode: reference map == accumulating map)."""
    omap = oracle.OracleMap(p)
    otable = np.zeros((2, p.L))
    # seed with first frame clustering (host path)
    otable, oc = omap.update(otable, otable, frames[0])

    from icm_slam_tpu.solver.icm import first_frame_labels
    labels0 = first_frame_labels(frames[0], p.dist_thr)
    state = lm.seed_from_clusters(L, jnp.asarray(frames[0]),
                                  labels0, jnp.float64)

    for pts in frames[1:]:
        otable, oc = omap.update(otable, otable, pts)
        B = pts.shape[0]
        state, labels = lm.update(state, state.pos, state.nact,
                                  jnp.asarray(pts), jnp.ones(B, bool),
                                  p.dist_thr, quirk=True)
    return omap, otable, state


def _frames(rng, n_frames=8, drift=0.05):
    """Simulated world points around 3 fixed clusters + occasional far obs."""
    centers = np.array([[0.0, 0.0], [5.0, 0.0], [0.0, 6.0]])
    frames = []
    for k in range(n_frames):
        pts = []
        for c in centers:
            m = rng.integers(2, 6)
            pts.append(c + rng.normal(0, drift, size=(m, 2)))
        if k == 4:  # a far observation spawning a new landmark
            pts.append(np.array([[20.0, 20.0], [20.3, 20.1]]))
        frames.append(np.concatenate(pts, axis=0))
    return frames


def test_update_matches_oracle():
    p = oracle.OracleParams(L=L)
    rng = np.random.default_rng(3)
    frames = _frames(rng)
    omap, otable, state = _run_pair(frames, p)

    assert int(state.nact) == omap.nact
    n = omap.nact
    np.testing.assert_allclose(np.asarray(state.pos[:n]).T, otable[:, :n],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.counts[:n]),
                               omap.counts[:n], atol=1e-9)


def test_filter_matches_oracle():
    p = oracle.OracleParams(L=L, cota=10.0)
    rng = np.random.default_rng(4)
    frames = _frames(rng, n_frames=12)
    omap, otable, state = _run_pair(frames, p)

    # oracle filter
    filtered = omap.filter(otable.copy())
    n_ref = omap.nact
    # jax filter
    fstate = lm.filter_map(state, p.cota, p.dist_thr)
    assert int(fstate.nact) == n_ref
    np.testing.assert_allclose(np.asarray(fstate.pos[:n_ref]).T,
                               filtered[:, :n_ref], atol=1e-9)
    np.testing.assert_allclose(np.asarray(fstate.counts[:n_ref]),
                               omap.counts[:n_ref], atol=1e-9)


def test_filter_merges_close_landmarks():
    p = oracle.OracleParams(L=L, cota=1.0, dist_thr=1.0)
    pos = jnp.zeros((L, 2), jnp.float64)
    pos = pos.at[0].set(jnp.array([0.0, 0.0]))
    pos = pos.at[1].set(jnp.array([0.5, 0.0]))   # within dist_thr of 0
    pos = pos.at[2].set(jnp.array([10.0, 0.0]))
    counts = jnp.zeros((L,), jnp.float64).at[:3].set(jnp.array([4.0, 2.0, 7.0]))
    state = lm.MapState(pos, counts, jnp.asarray(3, jnp.int32))
    out = lm.filter_map(state, 1.0, 1.0)
    assert int(out.nact) == 2
    merged = np.asarray(out.pos[0])
    np.testing.assert_allclose(merged, [0.5 * 2 / 6, 0.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.counts[:2]), [6.0, 7.0])


def test_filter_live_cap_exact():
    """filter_map(live_cap=K) == filter_map full when kept count <= K.

    The capped path is what _refine_step/_filter_jit use under the
    map_run_cap live bound (solver.icm.resolve_config)."""
    rng = np.random.default_rng(0)
    n_live = 40
    pos = jnp.zeros((L, 2)).at[:n_live].set(
        jnp.asarray(rng.uniform(-20, 20, (n_live, 2))))
    # a few deliberate near-duplicates to exercise the merge loop
    pos = pos.at[5].set(pos[3] + 0.05)
    pos = pos.at[17].set(pos[11] + 0.08)
    counts = jnp.zeros((L,)).at[:n_live].set(
        jnp.asarray(rng.integers(1, 30, n_live), jnp.float32))
    state = lm.MapState(pos, counts, jnp.asarray(n_live, jnp.int32))
    full = lm.filter_map(state, 3.0, 1.0)
    # live_cap must be < L to actually take the sliced path (K = live_cap)
    capped = lm.filter_map(state, 3.0, 1.0, live_cap=48)
    assert int(full.nact) == int(capped.nact)
    np.testing.assert_array_equal(np.asarray(full.pos[:48]),
                                  np.asarray(capped.pos[:48]))
    np.testing.assert_array_equal(np.asarray(full.counts[:48]),
                                  np.asarray(capped.counts[:48]))
    # rows past K are zero-padded in the sliced variant, dead in both
    assert not np.any(np.asarray(capped.pos[48:]))


def test_filter_relabel_walk_ignores_dead_rows():
    """The relabel walk stops at the dynamic live count.

    Rows past nact (and rows pruned by cota) must not influence the merge
    even when their stale coordinates sit within dist_thr of live
    landmarks — the walk's early cut is exact because close[] masks dead
    rows, so iterations past the live count are identity.
    """
    pos = jnp.zeros((L, 2), jnp.float64)
    pos = pos.at[0].set(jnp.array([0.0, 0.0]))
    pos = pos.at[1].set(jnp.array([0.5, 0.0]))   # merges with 0
    pos = pos.at[2].set(jnp.array([10.0, 0.0]))
    # dead rows: duplicates of live landmarks, both just past nact and in
    # the pruned-by-cota slot — visiting any of them would change counts
    pos = pos.at[3].set(jnp.array([10.1, 0.0]))  # pruned (count < cota)
    pos = pos.at[4].set(jnp.array([0.1, 0.0]))   # past nact entirely
    pos = pos.at[5].set(jnp.array([9.9, 0.0]))   # past nact entirely
    counts = jnp.zeros((L,), jnp.float64).at[:4].set(
        jnp.array([4.0, 2.0, 7.0, 0.5]))
    state = lm.MapState(pos, counts, jnp.asarray(4, jnp.int32))
    out = lm.filter_map(state, 1.0, 1.0)
    assert int(out.nact) == 2
    np.testing.assert_allclose(np.asarray(out.pos[0]),
                               [0.5 * 2 / 6, 0.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.pos[1]), [10.0, 0.0],
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.counts[:2]), [6.0, 7.0])


def test_connected_components():
    pts = jnp.asarray(np.array(
        [[0, 0], [0.5, 0], [1.0, 0], [5, 5], [5.4, 5], [9, 9]], float))
    mask = jnp.ones(6, bool)
    lab = lm.connected_component_labels(pts, mask, 0.6)
    lab = np.asarray(lm.compact_labels(lab, mask, 6))
    assert lab.tolist() == [0, 0, 0, 1, 1, 2]
