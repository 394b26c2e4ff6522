import jax
import numpy as np
import pytest

from cbfssm_tpu.serving import CompiledPredictor
from tests.test_cbfssm_model import make_model


def test_compiled_predictor(rng):
    model = make_model()
    params = model.init(jax.random.PRNGKey(0))
    pred = CompiledPredictor(model, params, batch=1, seq_len=8)
    u = rng.normal(size=(1, 8, 2))
    y = rng.normal(size=(1, 8, 1))
    out = pred(u, y)
    assert out.pred_mean.shape == (1, 8, 1)
    assert np.isfinite(np.asarray(out.pred_mean)).all()
    # matches the uncompiled path exactly (same key)
    ref = model.predict(params, u, y, pred.key, condition=False)
    np.testing.assert_allclose(
        np.asarray(out.pred_mean), np.asarray(ref.pred_mean), rtol=1e-12
    )


def test_compiled_predictor_shape_guard(rng):
    model = make_model()
    params = model.init(jax.random.PRNGKey(0))
    pred = CompiledPredictor(model, params, batch=1, seq_len=8)
    with pytest.raises(ValueError):
        pred(rng.normal(size=(2, 8, 2)), rng.normal(size=(2, 8, 1)))
    # a key the executable wasn't lowered for fails with the same clear
    # message as shape mismatches, not an opaque AOT signature error
    u, y = rng.normal(size=(1, 8, 2)), rng.normal(size=(1, 8, 1))
    with pytest.raises(ValueError, match="compiled for key"):
        pred(u, y, key=jax.random.key(0))  # new-style typed key
    with pytest.raises(ValueError, match="compiled for key"):
        pred(u, y, key=np.stack([np.asarray(pred.key)] * 2))  # batched
    # an equivalent uint32[2] key still works
    out = pred(u, y, key=np.asarray(pred.key))
    assert np.isfinite(np.asarray(out.pred_mean)).all()


def test_dim_h_zero_full_observation(rng):
    """dim_x == dim_y (RoboMoveSimple-style): the backward GP has a
    zero-width output; the whole pipeline must still work."""

    class DS:
        dim_u = 2
        dim_y = 3

    from cbfssm_tpu.models import CBFSSM

    cfg = {
        "ds": DS,
        "batch_size": 2,
        "shuffle": 10,
        "dim_x": 3,
        "ind_pnt_num": 4,
        "samples": 3,
        "learning_rate": 0.01,
        "loss_factors": np.asarray([1.0, 0.5]),
        "k_factor": 10.0,
        "recog_len": 2,
        "zeta_pos": 2.0,
        "zeta_mean": 0.01,
        "zeta_var": 1e-4,
        "var_x": np.asarray([0.01] * 3),
        "var_y": np.asarray([0.5] * 3),
        "gp_var": 0.25,
        "gp_len": 1.5,
        "dtype": "float64",
    }
    model = CBFSSM(cfg)
    assert model.dim_h == 0
    params = model.init(jax.random.PRNGKey(0))
    u = rng.normal(size=(2, 6, 2))
    y = rng.normal(size=(2, 6, 3))
    loss, aux = model.loss(params, u, y, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # entropy over a zero-width hidden state is exactly zero
    np.testing.assert_allclose(float(aux["entropy"]), 0.0)
    grads = jax.grad(lambda p: model.loss(p, u, y, jax.random.PRNGKey(1))[0])(params)
    assert np.abs(np.asarray(grads.gp_f.mean)).max() > 0
    out = model.predict(params, u, y, jax.random.PRNGKey(2))
    assert out.pred_mean.shape == (2, 6, 3)


def test_bucketed_predictor_row_isolation(rng):
    """Row i's prediction is bitwise independent of the pad/sibling
    rows (noise is indexed by row position; the GP predict is
    row-independent) — the property BucketedPredictor's padding relies
    on."""
    from cbfssm_tpu.serving import BucketedPredictor

    model = make_model()
    params = model.init(jax.random.PRNGKey(0))
    pred = BucketedPredictor(model, params, seq_len=8, buckets=(4,))
    u = rng.normal(size=(1, 8, 2))
    y = rng.normal(size=(1, 8, 1))
    out_padded = pred(u, y)  # padded 1 -> 4 with zeros
    assert np.asarray(out_padded.pred_mean).shape == (1, 8, 1)

    # same row alongside different (garbage) siblings, same bucket
    u4 = np.concatenate([u, rng.normal(size=(3, 8, 2))])
    y4 = np.concatenate([y, rng.normal(size=(3, 8, 1))])
    out_sib = pred(u4, y4)
    np.testing.assert_array_equal(
        np.asarray(out_padded.pred_mean), np.asarray(out_sib.pred_mean)[:1]
    )
    np.testing.assert_array_equal(
        np.asarray(out_padded.pred_var), np.asarray(out_sib.pred_var)[:1]
    )


def test_bucketed_predictor_buckets_and_chunking(rng):
    """Any request size works: bucket routing below the top bucket,
    chunking above it; mse is recomputed over the real rows."""
    from cbfssm_tpu.serving import BucketedPredictor

    model = make_model()
    params = model.init(jax.random.PRNGKey(0))
    pred = BucketedPredictor(model, params, seq_len=8, buckets=(1, 2, 4))
    for n in (1, 2, 3, 5, 9):
        u = rng.normal(size=(n, 8, 2))
        y = rng.normal(size=(n, 8, 1))
        out = pred(u, y)
        pm = np.asarray(out.pred_mean)
        assert pm.shape == (n, 8, 1), n
        assert np.isfinite(pm).all()
        np.testing.assert_allclose(
            float(out.mse), np.mean((pm - y) ** 2), rtol=1e-6
        )


def test_bucketed_predictor_input_guard(rng):
    from cbfssm_tpu.serving import BucketedPredictor

    model = make_model()
    params = model.init(jax.random.PRNGKey(0))
    pred = BucketedPredictor(model, params, seq_len=8, buckets=(2,))
    with pytest.raises(ValueError, match="expected"):
        pred(rng.normal(size=(1, 9, 2)), rng.normal(size=(1, 9, 1)))
    # a 0-row bucket would AOT-compile a useless program and then die
    # at serve time inside range(); fail at construction instead
    with pytest.raises(ValueError, match=">= 1"):
        BucketedPredictor(model, params, seq_len=8, buckets=(0,))
    with pytest.raises(ValueError, match=">= 1"):
        BucketedPredictor(model, params, seq_len=8, buckets=(2, -1))


def test_bucketed_predictor_chunks_draw_independent_noise(rng):
    """Chunks of an oversize request must get distinct MC draws: the
    same sequence placed in chunk 0 and chunk 1 yields different sample
    paths (the chunk index is folded into the key)."""
    from cbfssm_tpu.serving import BucketedPredictor

    model = make_model()
    params = model.init(jax.random.PRNGKey(0))
    pred = BucketedPredictor(model, params, seq_len=8, buckets=(2,))
    u1 = rng.normal(size=(1, 8, 2))
    y1 = rng.normal(size=(1, 8, 1))
    # rows 0..1 = chunk 0, rows 2..3 = chunk 1; row 0 == row 2
    u = np.concatenate([u1, rng.normal(size=(1, 8, 2)), u1,
                        rng.normal(size=(1, 8, 2))])
    y = np.concatenate([y1, rng.normal(size=(1, 8, 1)), y1,
                        rng.normal(size=(1, 8, 1))])
    out = pred(u, y)
    pm = np.asarray(out.pred_mean)
    assert np.abs(pm[0] - pm[2]).max() > 0


def test_bucketed_predictor_y_shape_guard(rng):
    """A mismatched y must fail with a clear error, not a misleading
    compiled-signature TypeError from the AOT executable."""
    from cbfssm_tpu.serving import BucketedPredictor

    model = make_model()
    params = model.init(jax.random.PRNGKey(0))
    pred = BucketedPredictor(model, params, seq_len=8, buckets=(2,))
    with pytest.raises(ValueError, match="y must be"):
        pred(rng.normal(size=(2, 8, 2)), rng.normal(size=(1, 8, 1)))


class TestPlanBuckets:
    """Histogram-driven bucket-ladder planning (BucketedPredictor
    .from_histogram / .plan_buckets)."""

    def test_bimodal_traffic_picks_both_modes(self):
        from cbfssm_tpu.serving import BucketedPredictor as BP

        sizes = [1] * 90 + [32] * 10
        assert BP.plan_buckets(sizes, max_buckets=2) == [1, 32]
        # with budget 1 the single bucket must cover the max
        assert BP.plan_buckets(sizes, max_buckets=1) == [32]

    def test_budget_never_exceeded_and_max_covered(self, rng):
        from cbfssm_tpu.serving import BucketedPredictor as BP

        sizes = rng.integers(1, 50, size=500)
        for k in (1, 2, 3, 5):
            buckets = BP.plan_buckets(sizes, max_buckets=k)
            assert len(buckets) <= k
            assert buckets[-1] == int(sizes.max())

    def test_matches_bruteforce_optimum(self, rng):
        """The DP is exact: equal to brute force over every candidate
        ladder on small instances."""
        import itertools

        from cbfssm_tpu.serving import BucketedPredictor as BP

        sizes = rng.integers(1, 12, size=60)
        uniq = sorted(set(int(s) for s in sizes))
        top = uniq[-1]
        for k in (1, 2, 3):
            got = BP.plan_buckets(sizes, max_buckets=k)
            best = min(
                (
                    BP.expected_cost(list(c) + [top], sizes)
                    for m in range(1, k + 1)
                    for c in itertools.combinations(uniq, m - 1)
                ),
                default=None,
            )
            np.testing.assert_allclose(
                BP.expected_cost(got, sizes), best, rtol=1e-12
            )

    def test_cost_model_shapes_the_ladder(self):
        from cbfssm_tpu.serving import BucketedPredictor as BP

        sizes = [1] * 50 + [31] * 50
        # free padding -> one bucket suffices even with budget 2
        assert BP.plan_buckets(sizes, 2, cost=(1.0, 0.0)) == [31]
        # expensive padding -> split
        assert BP.plan_buckets(sizes, 2, cost=(1.0, 1.0)) == [1, 31]

    def test_guards(self):
        from cbfssm_tpu.serving import BucketedPredictor as BP

        with pytest.raises(ValueError):
            BP.plan_buckets([], 2)
        with pytest.raises(ValueError):
            BP.plan_buckets([0, 3], 2)
        with pytest.raises(ValueError):
            BP.plan_buckets([3], 0)

    def test_from_histogram_end_to_end(self, rng):
        from cbfssm_tpu.serving import BucketedPredictor as BP

        model = make_model()
        params = model.init(jax.random.PRNGKey(0))
        sizes = [1] * 20 + [4] * 5
        pred = BP.from_histogram(model, params, seq_len=8, sizes=sizes,
                                 max_buckets=2)
        assert pred.buckets == [1, 4]
        u = rng.normal(size=(3, 8, 2))
        y = rng.normal(size=(3, 8, 1))
        out = pred(u, y)
        assert out.pred_mean.shape == (3, 8, 1)
        assert np.isfinite(np.asarray(out.pred_mean)).all()


def test_batch_predictor_rejects_dict_predict_models(rng):
    """VoliroSSM's predict returns a plain dict, not a PredictOutput —
    the batch predictors must reject it at CONSTRUCTION (before the
    expensive AOT compile), not die with AttributeError after the
    first dispatch."""
    from cbfssm_tpu.models import Voliro
    from tests.test_other_models import voliro_config

    model = Voliro(voliro_config())
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(TypeError, match="PredictOutput"):
        CompiledPredictor(model, params, batch=1, seq_len=4)


def test_compiled_predictor_feature_dim_guard(rng):
    """Feature-dim mismatches must raise the clear ValueError, not an
    AOT compiled-signature error."""
    model = make_model()
    params = model.init(jax.random.PRNGKey(0))
    pred = CompiledPredictor(model, params, batch=2, seq_len=8)
    u = rng.normal(size=(2, 8, model.dim_u))
    y = rng.normal(size=(2, 8, model.dim_y))
    with pytest.raises(ValueError, match="compiled for u"):
        pred(rng.normal(size=(2, 8, model.dim_u + 1)), y)
    with pytest.raises(ValueError, match="compiled for y"):
        pred(u, rng.normal(size=(2, 8, model.dim_y + 1)))
