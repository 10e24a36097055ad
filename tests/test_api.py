"""README-level API tests + regressions (reference: test/runtests.jl:19-70)."""

import jax.numpy as jnp
import numpy as np
import pytest

import leastsquaresoptim_jl_tpu as lso


def rosenbrock(x):
    return jnp.array([1 - x[0], 100 * (x[1] - x[0] ** 2)])


def rosenbrock_jac(x):
    return jnp.array([[-1.0, 0.0], [-200.0 * x[0], 100.0]])


def test_readme_out_of_place():
    for opt in (lso.Dogleg(), lso.LevenbergMarquardt()):
        r = lso.optimize(rosenbrock, jnp.zeros(2), opt)
        assert r.converged
        assert np.allclose(r.minimizer, [1.0, 1.0], atol=1e-6)


def test_readme_central_autodiff():
    r = lso.optimize(rosenbrock, jnp.zeros(2), lso.Dogleg(), autodiff="central")
    assert r.converged
    assert np.allclose(r.minimizer, [1.0, 1.0], atol=1e-5)


def test_readme_with_jacobian():
    r = lso.optimize(rosenbrock, jnp.zeros(2), lso.Dogleg(), g=rosenbrock_jac)
    assert r.converged
    assert np.allclose(r.minimizer, [1.0, 1.0], atol=1e-6)


def test_scalar_valued_function():
    """Scalar residual regression (reference issue #41, runtests.jl:43-46)."""
    func = lambda x: jnp.sum(x**2)
    for opt in (lso.Dogleg(), lso.LevenbergMarquardt()):
        r = lso.optimize(func, jnp.array([1.0, 1.0]), opt)
        assert r.ssr <= 1e-3


def test_output_length_inference_nonsquare():
    """output_length must come from the residual length, not n
    (reference: runtests.jl:52-61)."""

    def overdet(x):
        return jnp.array([x[0] - 1, x[1] - 2, x[2] - 3, x[0] + x[1], x[1] + x[2]])

    p = lso.least_squares_problem(f=overdet, x=jnp.zeros(3))
    assert p.m == 5
    r = lso.optimize_problem(p, lso.Dogleg())
    assert r.converged


def test_store_trace():
    """store_trace populates OptimizationState rows (reference: runtests.jl:63-70)."""
    for opt in (lso.LevenbergMarquardt(), lso.Dogleg()):
        r = lso.optimize(rosenbrock, jnp.zeros(2), opt, store_trace=True)
        assert len(r.tr) >= 1
        assert isinstance(r.tr[0], lso.OptimizationState)
        # iteration 0 row records the initial ssr
        assert r.tr[0].iteration == 0
        assert r.tr[0].value == pytest.approx(1.0)
        s = str(r.tr)
        assert "Function value" in s


def test_result_show():
    r = lso.optimize(rosenbrock, jnp.zeros(2), lso.Dogleg())
    s = repr(r)
    assert "Results of Optimization Algorithm" in s
    assert "success" in s
    assert "Dogleg" in s


def test_work_counters():
    r = lso.optimize(rosenbrock, jnp.zeros(2), lso.LevenbergMarquardt())
    assert r.f_calls >= r.iterations + 1
    assert 1 <= r.g_calls <= r.iterations
    assert r.mul_calls >= 2 * r.iterations


def test_radius_option_and_tolerances():
    r = lso.optimize(
        rosenbrock, jnp.zeros(2), lso.LevenbergMarquardt(), radius=1.0,
        x_tol=1e-12, f_tol=1e-12, g_tol=1e-12,
    )
    assert r.converged
    assert r.x_tol == 1e-12


def test_non_finite_raises():
    """Counterpart of the reference IsFiniteException
    (src/utils/utils.jl:63-78)."""

    def bad(x):
        return jnp.array([jnp.sqrt(x[0] - 10.0), x[1]]) * jnp.inf

    with pytest.raises(lso.IsFiniteError):
        lso.optimize(bad, jnp.ones(2) * 20.0, lso.LevenbergMarquardt())


def test_initial_guess_outside_bounds_raises():
    """Reference: levenberg_marquardt.jl:49-51."""
    with pytest.raises(ValueError):
        lso.optimize(rosenbrock, jnp.zeros(2), lso.Dogleg(), lower=[0.5, 0.5])


def test_qr_rejected_for_matrix_free():
    """Reference: src/types.jl:114-118 rejects QR for sparse Jacobians."""
    p = lso.least_squares_problem(
        f=rosenbrock, x=jnp.zeros(2), materialize_jacobian=False
    )
    with pytest.raises(ValueError):
        lso.optimize_problem(p, lso.Dogleg(lso.QR()))


def test_solve_is_jittable():
    import jax

    p = lso.least_squares_problem(f=rosenbrock, x=jnp.zeros(2))
    run = jax.jit(lambda x0: lso.solve(p, lso.LevenbergMarquardt(), x0=x0))
    raw = run(jnp.zeros(2))
    assert bool(raw["converged"])
    assert np.allclose(raw["minimizer"], [1.0, 1.0], atol=1e-6)


def test_resume_from_x0_and_checkpoint(tmp_path):
    """optimize_problem(x0=...) resumes a solve from a previous iterate
    (the reference's optimize! in-place nls.x semantics, src/types.jl:189),
    and the checkpoint helpers round-trip the raw result."""
    import numpy as np

    from leastsquaresoptim_jl_tpu.utils import checkpoint

    def f(x):
        return jnp.array([1 - x[0], 2.0 * (x[1] - x[0] ** 2)])

    p = lso.least_squares_problem(f=f, x=jnp.zeros(2))
    r1 = lso.optimize_problem(p, lso.Dogleg(), iterations=3)
    assert not r1.converged
    # checkpoint the iterate, resume, and finish
    path = str(tmp_path / "ckpt")
    checkpoint.save_pytree(path, {"minimizer": r1.minimizer})
    x_resume = checkpoint.resume_x0(path)
    assert np.allclose(x_resume, r1.minimizer)
    r2 = lso.optimize_problem(p, lso.Dogleg(), x0=x_resume)
    assert r2.converged
    assert np.allclose(r2.minimizer, [1.0, 1.0], atol=1e-6)
    # resumed solve must beat restarting for the same extra budget
    assert r2.ssr <= 1e-10
    # structure mismatch with equal leaf count must be loud, not scramble
    import pytest

    with pytest.raises(ValueError, match="structure"):
        checkpoint.load_pytree(path, {"renamed": r1.minimizer})


def test_result_from_raw_on_raw_solve():
    """result_from_raw composes with raw pytrees from solve/solve_batch
    (no host-verb 'optimizer' key injected)."""
    from leastsquaresoptim_jl_tpu.result import result_from_raw

    def f(x):
        return jnp.array([1 - x[0], 10.0 * (x[1] - x[0] ** 2)])

    p = lso.least_squares_problem(f=f, x=jnp.zeros(2))
    raw = lso.solve(p, lso.Dogleg(lso.QR()))
    res = result_from_raw(dict(raw), lso.Options())
    assert res.converged and np.allclose(res.minimizer, [1.0, 1.0], atol=1e-6)
    assert isinstance(res.optimizer, str)


def test_multidim_residual_grid_ravels():
    """A residual returning a 2-D grid is raveled: output_length inference
    counts elements, so the surface must match (e.g. image-fitting models)."""
    target = jnp.arange(12.0).reshape(3, 4)

    def f(x):
        return x[0] * jnp.ones((3, 4)) + x[1] - target

    r = lso.optimize(f, jnp.zeros(2))
    assert r.converged
    # minimizes sum over the grid; optimum satisfies x0 + x1 = mean(target)
    assert np.isclose(r.minimizer[0] + r.minimizer[1], float(target.mean()),
                      atol=1e-6)


def test_pytree_parameters():
    """Structured (pytree) parameters: f sees the original structure, the
    result minimizer comes back in it. JAX-idiomatic extension; the
    reference is vector-only."""
    import numpy as np

    data_x = jnp.linspace(1.0, 60.0, 32)
    true = {"scale": jnp.array(240.0), "rate": jnp.array(5e-4)}
    data_y = true["scale"] * (1 - jnp.exp(-true["rate"] * data_x))

    def f(p):
        return data_y - p["scale"] * (1 - jnp.exp(-p["rate"] * data_x))

    x0 = {"scale": jnp.array(200.0), "rate": jnp.array(1e-3)}
    r = lso.optimize(f, x0, lso.LevenbergMarquardt(lso.Cholesky()))
    assert r.converged
    assert isinstance(r.minimizer, dict)
    assert np.allclose(r.minimizer["scale"], 240.0, rtol=1e-6)
    assert np.allclose(r.minimizer["rate"], 5e-4, rtol=1e-6)
    # structured x0 override on an existing problem (resume semantics)
    p = lso.least_squares_problem(f=f, x=x0)
    r2 = lso.optimize_problem(p, lso.Dogleg(), x0=r.minimizer)
    assert r2.converged
    assert np.allclose(r2.minimizer["scale"], 240.0, rtol=1e-6)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax path: async/sharded-aware checkpointing for multi-host runs."""
    import jax
    import numpy as np

    from leastsquaresoptim_jl_tpu.utils import checkpoint

    tree = {"minimizer": jnp.arange(4.0), "ssr": jnp.asarray(1.5)}
    p = str(tmp_path / "ck")
    checkpoint.save_pytree_orbax(p, tree)
    back = checkpoint.load_pytree_orbax(
        p, jax.tree_util.tree_map(np.zeros_like, tree)
    )
    assert np.allclose(back["minimizer"], tree["minimizer"])
    assert float(back["ssr"]) == 1.5


def test_polish_refines_f32_minimizer():
    """lso.polish: the mixed-precision finish — a short f64 refinement from
    an f32 minimizer reaches f64-level accuracy (benchmarks/sweep_f32.py is
    the on-chip version of this flow)."""
    x = jnp.linspace(1.0, 80.0, 40)
    true = np.array([240.0, 5e-2])
    y64 = jnp.asarray(true[0] * (1 - np.exp(-true[1] * np.asarray(x))))

    def f(b):
        return y64 - b[0] * (1 - jnp.exp(-b[1] * x))

    # f32 stage: data and params in f32
    x32, y32 = jnp.asarray(x, jnp.float32), jnp.asarray(y64, jnp.float32)
    r32 = lso.optimize(
        lambda b: y32 - b[0] * (1 - jnp.exp(-b[1] * x32)),
        jnp.asarray([200.0, 1e-1], jnp.float32),
    )
    assert r32.converged
    err32 = np.max(np.abs(np.asarray(r32.minimizer) - true) / true)
    # f64 polish from the f32 minimizer (f computes in f64)
    r = lso.polish(f, r32.minimizer, x_tol=1e-50, f_tol=1e-36, g_tol=1e-50)
    err = np.max(np.abs(np.asarray(r.minimizer) - true) / true)
    assert err <= 1e-9, err
    assert err < err32
    # polish result is f64
    assert np.asarray(r.minimizer).dtype == np.float64


def test_dtype_scaled_tolerance_defaults():
    """config.default_tolerances: f64 keeps reference parity (1e-8), f32
    uses the tuned constants, lower-precision dtypes get eps-scaled floors
    (never an f32 constant below their own noise floor)."""
    from leastsquaresoptim_jl_tpu import config

    assert config.default_tolerances(np.float64) == (1e-8, 1e-8, 1e-8)
    assert config.default_tolerances(np.float32) == (
        config.F32_X_TOL, config.F32_F_TOL, config.F32_G_TOL
    )
    x_tol, f_tol, g_tol = config.default_tolerances(jnp.bfloat16)
    eps = float(jnp.finfo(jnp.bfloat16).eps)
    assert f_tol == 8.0 * eps and x_tol == 8.0 * eps and g_tol == 80.0 * eps
    assert f_tol > eps  # a criterion that can actually fire


def test_optimize_compile_reuse_same_spec():
    """A second ``optimize`` call with an identical spec (same f object,
    same x0 structure/shape/dtype, different values) reuses the cached
    problem and compiled executable — zero new jit-cache misses. The
    reference analogue is LeastSquaresProblemAllocated workspace reuse
    (src/types.jl:141-160); VERDICT r2 weak #5."""
    from leastsquaresoptim_jl_tpu import api

    def f(x):
        return jnp.array([1.0 - x[0], 10.0 * (x[1] - x[0] ** 2)])

    api._PROBLEM_CACHE.clear()
    r1 = lso.optimize(f, jnp.zeros(2))
    assert len(api._PROBLEM_CACHE) == 1
    ((prob1, _),) = api._PROBLEM_CACHE.values()
    jits = dict(prob1._jit_cache)  # executables compiled so far
    r2 = lso.optimize(f, jnp.array([0.3, -0.2]))
    ((prob2, _),) = api._PROBLEM_CACHE.values()
    # same problem object, same jitted executables — zero recompilation
    assert prob2 is prob1 and dict(prob1._jit_cache) == jits
    assert r1.converged and r2.converged
    assert np.allclose(r2.minimizer, [1.0, 1.0], atol=1e-5)
    # a different structure (shape) is a different problem: miss, no clash
    def f3(x):
        return jnp.array([1.0 - x[0], 10.0 * (x[1] - x[0] ** 2), x[2]])

    r3 = lso.optimize(f3, jnp.zeros(3))
    assert len(api._PROBLEM_CACHE) == 2
    assert r3.converged


def test_optimize_cache_sees_rebound_closure_data():
    """Rebinding an array the residual closes over must NOT keep serving
    the stale cached problem: the compiled executable baked the old array
    in as a trace constant, so identity-keying on ``f`` alone would
    silently return a fit to the OLD data. The cache key fingerprints the
    arrays reachable from f's closure/globals (api._captured_arrays)."""
    ydata = jnp.array([2.0, 4.0, 6.0, 8.0])
    xdata = jnp.array([1.0, 2.0, 3.0, 4.0])

    def f(b):
        return ydata - b[0] * xdata

    r1 = lso.optimize(f, jnp.zeros(1))
    assert np.allclose(r1.minimizer, [2.0], atol=1e-8)
    # rebind the captured data: same f object, new closure-cell contents
    ydata = jnp.array([3.0, 6.0, 9.0, 12.0])
    r2 = lso.optimize(f, jnp.zeros(1))
    assert np.allclose(r2.minimizer, [3.0], atol=1e-8)


def test_optimize_cache_sees_inplace_numpy_mutation():
    """In-place mutation of a captured *numpy* array (same object id, new
    contents) must invalidate the cache: numpy arrays are fingerprinted by
    content, not identity (jax.Arrays are immutable so identity suffices)."""
    ydata = np.array([2.0, 4.0, 6.0, 8.0])
    xdata = np.array([1.0, 2.0, 3.0, 4.0])

    def f(b):
        return jnp.asarray(ydata) - b[0] * jnp.asarray(xdata)

    r1 = lso.optimize(f, jnp.zeros(1))
    assert np.allclose(r1.minimizer, [2.0], atol=1e-8)
    ydata[:] = [3.0, 6.0, 9.0, 12.0]  # same object, new data
    r2 = lso.optimize(f, jnp.zeros(1))
    assert np.allclose(r2.minimizer, [3.0], atol=1e-8)


def test_optimize_cache_sees_rebound_scalar():
    """A captured Python scalar is a trace constant too: rebinding it must
    invalidate the cache like rebinding an array does."""
    scale = 2.0

    def f(b):
        return jnp.array([b[0] - scale])

    r1 = lso.optimize(f, jnp.zeros(1))
    assert np.allclose(r1.minimizer, [2.0], atol=1e-10)
    scale = 3.0
    r2 = lso.optimize(f, jnp.zeros(1))
    assert np.allclose(r2.minimizer, [3.0], atol=1e-10)


def test_curve_fit_reuses_compiled_problem():
    """Repeated curve_fit calls with the same model+data reuse one cached
    residual closure — and therefore one compiled problem — instead of
    recompiling per call (the closure is keyed on data fingerprints)."""
    from leastsquaresoptim_jl_tpu import api
    from leastsquaresoptim_jl_tpu.models import curves

    x = np.linspace(1.0, 10.0, 30)
    y = 3.0 * (1.0 - np.exp(-0.4 * x))
    r1 = lso.curve_fit("exp_saturation", x, y, [2.0, 0.3])
    n_problems = len(api._PROBLEM_CACHE)
    n_residuals = len(curves._RESIDUAL_CACHE)
    r2 = lso.curve_fit("exp_saturation", x, y, [2.5, 0.5])
    assert len(api._PROBLEM_CACHE) == n_problems  # same problem object
    assert len(curves._RESIDUAL_CACHE) == n_residuals
    assert r1.converged and r2.converged
    assert np.allclose(r1.minimizer, r2.minimizer, atol=1e-6)
    # changed data => different fingerprint => fresh problem (no stale fit)
    y2 = 5.0 * (1.0 - np.exp(-0.4 * x))
    r3 = lso.curve_fit("exp_saturation", x, y2, [2.0, 0.3])
    assert np.allclose(r3.minimizer[0], 5.0, atol=1e-5)


def test_optimize_cache_sees_bound_method_state():
    """A residual passed as a bound method: rebinding an attribute of its
    receiver must invalidate the cache (the receiver's attributes are the
    closure in every practical sense)."""

    class Fitter:
        def __init__(self, y):
            self.y = jnp.asarray(y)
            self.x = jnp.array([1.0, 2.0, 3.0, 4.0])

        def resid(self, b):
            return self.y - b[0] * self.x

    obj = Fitter([2.0, 4.0, 6.0, 8.0])
    fm = obj.resid
    r1 = lso.optimize(fm, jnp.zeros(1))
    assert np.allclose(r1.minimizer, [2.0], atol=1e-8)
    obj.y = jnp.array([3.0, 6.0, 9.0, 12.0])
    r2 = lso.optimize(fm, jnp.zeros(1))
    assert np.allclose(r2.minimizer, [3.0], atol=1e-8)


def test_restart_on_suspect_stop_mechanics():
    """optimize_problem(restarts=k): a stop not certified by the KKT test
    triggers a probe re-solve from the minimizer (same compiled executable);
    a genuine optimum re-stops immediately, the result is unchanged, and
    the probe's work is accounted. docs/ROADMAP.md r2 #5; measured in the
    f32 sweep: the real rescues come from the multistart escalation, the
    restart is the cheap first rung."""
    def f(x):
        return jnp.array([1.0 - x[0], 10.0 * (x[1] - x[0] ** 2)])

    p = lso.least_squares_problem(f=f, x=jnp.zeros(2))
    r0 = lso.optimize_problem(p, lso.Dogleg())
    r1 = lso.optimize_problem(p, lso.Dogleg(), restarts=2)
    assert np.allclose(r0.minimizer, r1.minimizer)
    assert r1.converged
    # the probe ran (work accounted) and stopped the loop on no-progress
    if not r0.g_converged:
        assert r1.iterations > r0.iterations
        assert r1.f_calls > r0.f_calls
    # g-converged results are final: no probe at all
    rg = lso.optimize_problem(
        p, lso.Dogleg(), x_tol=0.0, f_tol=0.0, g_tol=1e-8
    )
    if rg.g_converged:
        rg2 = lso.optimize_problem(
            p, lso.Dogleg(), x_tol=0.0, f_tol=0.0, g_tol=1e-8, restarts=3
        )
        assert rg2.iterations == rg.iterations
