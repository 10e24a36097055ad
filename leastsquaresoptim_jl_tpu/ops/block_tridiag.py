"""Block-tridiagonal SPD factorization for banded normal systems.

The reference covers banded/structured Jacobians through Julia's sparse-CSC
factorizations (``\\`` over SuiteSparse; exercised by the
test/nonlinearsolvers.jl:539-570 sweep). CSC scatter/gather does not map to
the TPU, so this module is the TPU-native replacement for the *banded*
subclass that dominates those workloads (1-D BVP/chain models:
broyden_tridiagonal, discrete_boundary_value, discrete_integral_equation):
a **block-tridiagonal Cholesky** over dense (s, s) blocks, built from three
batched primitives XLA compiles well — a `lax.scan` of small dense
`cholesky` / `solve_triangular` / matmul steps — instead of scalar-indexed
sparse elimination.

Matrix-free Gram recovery: a block-tridiagonal matrix A (block size s) has
column support limited to the three neighboring blocks, so columns whose
block indices differ by >= 3 never overlap — **3s structured probes**
recover A = J'J + diag(damp) EXACTLY (the banded analogue of the colored
compressed-AD trick in ops/sparse.py, and of the reference's exact
colsumabs2! contract). Each probe costs one matvec + one rmatvec through
the operator; the factorization then costs O(nb * s^3) with nb = n/s block
rows. Compare LSMR: 2 matvecs per inner iteration with iteration count set
by conditioning. Measured design point (benchmarks/bench_block_cholesky.py,
m=1M banded BVP, n=100k, v5e): the direct route converges in fewer LM
iterations (7 vs 12) on 2.7x fewer matvecs; it wins wall-clock **3.0x**
when the model evaluation is expensive (transcendental-bound arm) and
loses 0.5x on the cheapest possible model, where the solve's fixed
per-kernel launch overhead (see _soa_split) dominates instead of evals.

Contract: the Gram of the user's Jacobian must be block-tridiagonal with
the declared block size (residual i may couple parameter blocks b and b'
only if |b - b'| <= 1 ... i.e. each residual row touches parameters at
most s apart in index after blocking). Aliasing from a wider true support
corrupts the recovered blocks silently — `probe_gram_blocks` is exact if
and only if the structure holds; tests/test_block_cholesky.py pins
exactness on the MINPACK banded family.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular


def block_probe_matrix(n: int, s: int, dtype) -> jnp.ndarray:
    """(3s, n) probe matrix for exact block-tridiagonal column recovery.

    Probe (c, o) (flattened row c*s + o) is the indicator of columns
    ``{b*s + o : b % 3 == c}``: within one probe, contributing columns sit
    >= 3 blocks apart, so their responses occupy disjoint row ranges in a
    block-tridiagonal matrix and superpose without aliasing."""
    if n % s != 0:
        raise ValueError(
            f"block size {s} must divide n={n} (pad the parameter vector "
            "or choose a divisor block size)"
        )
    j = np.arange(n)
    b, o = j // s, j % s
    P = np.zeros((3, s, n), dtype=np.float64)
    P[b % 3, o, j] = 1.0
    return jnp.asarray(P.reshape(3 * s, n), dtype)


def extract_blocks(AV: jnp.ndarray, n: int, s: int):
    """Recover (D, L) from the probe responses.

    ``AV`` is (3s, n) with row c*s+o = A @ probe(c, o). Returns the
    diagonal blocks ``D`` (nb, s, s) and lower off-diagonal blocks ``L``
    (nb-1, s, s) with ``L[b] = A[(b+1)s:(b+2)s, bs:(b+1)s]`` (the upper
    blocks are ``L[b].T`` by symmetry)."""
    nb = n // s
    AVr = AV.reshape(3, s, nb, s)  # [class c, col offset o, row block, row r]
    bidx = jnp.arange(nb)
    cls = bidx % 3
    # D_b[r, o] = A[b*s + r, b*s + o] = AVr[b % 3, o, b, r]
    D = jnp.transpose(AVr[cls, :, bidx, :], (0, 2, 1))
    if nb == 1:
        L = jnp.zeros((0, s, s), AV.dtype)
        return D, L
    # L_b[r, o] = A[(b+1)*s + r, b*s + o] = AVr[b % 3, o, b + 1, r]
    L = jnp.transpose(AVr[cls[:-1], :, bidx[:-1] + 1, :], (0, 2, 1))
    return D, L


def probe_gram_blocks(matvec, rmatvec, n: int, s: int, dtype, damp=None):
    """(D, L) blocks of ``A = J'J [+ diag(damp)]`` via 3s probe
    matvec-pairs (vmapped — one batched J/J' application each)."""
    P = block_probe_matrix(n, s, dtype)
    AV = jax.vmap(lambda v: rmatvec(matvec(v)))(P)
    if damp is not None:
        AV = AV + damp[None, :] * P
    return extract_blocks(AV, n, s)


def block_tridiag_cholesky(D: jnp.ndarray, L: jnp.ndarray):
    """Blocked Cholesky ``A = G_blk G_blk'`` of the SPD block-tridiagonal
    ``(D, L)``: a `lax.scan` over block rows of dense (s, s) steps
    (cholesky, triangular solve, one matmul) — the TPU shape of banded
    LAPACK ``pbtrf``. Returns ``(G, C)``: per-block lower-triangular
    diagonal factors (nb, s, s) and factor off-diagonal blocks
    (nb-1, s, s). A non-SPD input surfaces as NaNs in G (jnp.linalg
    semantics), which callers turn into a jittered retry."""
    nb, s = D.shape[0], D.shape[-1]
    Lpad = jnp.concatenate([L, jnp.zeros((1, s, s), D.dtype)], axis=0)

    def step(prev_cct, inp):
        Db, Lb = inp
        G = jnp.linalg.cholesky(Db - prev_cct)
        # C_b = L_b G_b^{-T}  <=>  C_b' = G_b^{-1} L_b'
        Ct = solve_triangular(G, jnp.swapaxes(Lb, -1, -2), lower=True)
        return Ct.T @ Ct, (G, Ct.T)

    _, (G, C) = jax.lax.scan(step, jnp.zeros((s, s), D.dtype), (D, Lpad))
    return G, C[:-1]


def block_tridiag_solve(G: jnp.ndarray, C: jnp.ndarray, b: jnp.ndarray):
    """Solve ``A x = b`` given the blocked factor ``(G, C)``; ``b`` is
    (n,). Forward substitution scans down the block rows, back
    substitution scans up."""
    nb, s = G.shape[0], G.shape[-1]
    bb = b.reshape(nb, s)
    Cpad = jnp.concatenate([jnp.zeros((1, s, s), G.dtype), C], axis=0)

    def fwd(y_prev, inp):
        Gb, Cb, rb = inp
        y = solve_triangular(Gb, rb - Cb @ y_prev, lower=True)
        return y, y

    _, y = jax.lax.scan(fwd, jnp.zeros((s,), G.dtype), (G, Cpad, bb))

    Cpad2 = jnp.concatenate([C, jnp.zeros((1, s, s), G.dtype)], axis=0)

    def bwd(x_next, inp):
        Gb, Cb, yb = inp
        x = solve_triangular(
            jnp.swapaxes(Gb, -1, -2), yb - Cb.T @ x_next, lower=False
        )
        return x, x

    _, x = jax.lax.scan(
        bwd, jnp.zeros((s,), G.dtype), (G, Cpad2, y), reverse=True
    )
    return x.reshape(nb * s)


def _binv(D):
    """Batched (k, s, s) inverse: closed-form at s <= 2 (pure VPU
    elementwise — no batched-linalg kernels in the hot path), LU beyond."""
    s = D.shape[-1]
    if s == 1:
        return 1.0 / D
    if s == 2:
        a, b = D[..., 0, 0], D[..., 0, 1]
        c, d = D[..., 1, 0], D[..., 1, 1]
        det = a * d - b * c
        adj = jnp.stack(
            [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2
        )
        return adj / det[..., None, None]
    return jnp.linalg.inv(D)


def _shift_down(a, count):
    """[0, a[0], ..., a[count-2]] — left-neighbor alignment."""
    z = jnp.zeros((1,) + a.shape[1:], a.dtype)
    return jnp.concatenate([z, a[: count - 1]], axis=0)


def _pad_to(a, count):
    """a padded with trailing zeros to length ``count``."""
    k = a.shape[0]
    if k == count:
        return a
    z = jnp.zeros((count - k,) + a.shape[1:], a.dtype)
    return jnp.concatenate([a, z], axis=0)


def _soa_split(M):
    """(k, s, s) -> s x s nested list of (k,) component arrays.

    Struct-of-arrays avoids the batched-tiny-block layout trap: a
    (k, 2, 2) array puts both block dims minor, where the (8, 128) tile
    padding wastes ~256x the bytes and every batched matmul lowers to
    tiny strided dots; (k,)-major components make all block algebra
    elementwise VPU work. NOTE (measured, v5e via axon): the solve
    remains LAUNCH-overhead-bound, not bandwidth-bound — each unfused
    op costs ~0.1-0.2 ms regardless of size on this runtime, and the
    level-halving shapes block cross-level fusion, so the s=2 solve at
    nb=50k sits at ~12 ms either way. The win of the banded direct
    route is its MATVEC COUNT (6s+1 per solve vs LSMR's
    conditioning-dependent 2/inner-iter), which dominates when model
    evaluations are expensive (benchmarks/bench_block_cholesky.py:
    3.0x over LSMR on the transcendental-bound arm, 0.5x on the
    cheap-eval arm)."""
    s = M.shape[-1]
    return [[M[..., i, j] for j in range(s)] for i in range(s)]


def _soa_mm(A, B, s, neg=False):
    """Block matmul on component lists: C = (-)A @ B."""
    out = []
    for i in range(s):
        row = []
        for l in range(s):
            acc = A[i][0] * B[0][l]
            for j in range(1, s):
                acc = acc + A[i][j] * B[j][l]
            row.append(-acc if neg else acc)
        out.append(row)
    return out


def _soa_mv(A, x, s):
    """Block matvec on component lists: y = A @ x."""
    out = []
    for i in range(s):
        acc = A[i][0] * x[0]
        for j in range(1, s):
            acc = acc + A[i][j] * x[j]
        out.append(acc)
    return out


def _soa_sub(A, B, s):
    return [[A[i][j] - B[i][j] for j in range(s)] for i in range(s)]


def _soa_inv(A, s):
    """Closed-form component inverse (s <= 2; the SoA path's regime)."""
    if s == 1:
        return [[1.0 / A[0][0]]]
    a, b, c, d = A[0][0], A[0][1], A[1][0], A[1][1]
    det = a * d - b * c
    return [[d / det, -b / det], [-c / det, a / det]]


def _soa_map(f, A, s):
    return [[f(A[i][j]) for j in range(s)] for i in range(s)]


# Stop the cyclic reduction at this many block rows and solve the
# remainder as one dense Cholesky: below ~a tile the halving levels are
# pure op-launch latency.
_CR_DENSE_TAIL_NB = 64


def extract_blocks_soa(AV: jnp.ndarray, n: int, s: int):
    """SoA variant of :func:`extract_blocks`: (Dsoa, Lsoa) nested lists
    of (nb,)/(nb-1,) component arrays, read DIRECTLY from the (3s, n)
    probe-response array (n-minor — well tiled). Materializing the
    (nb, s, s) form first costs ~256x tile padding on the tiny minor
    dims at s = 2 (measured: reading it back dominated the whole
    cyclic-reduction solve)."""
    nb = n // s
    A3 = AV.reshape(3, s, n)
    cls = jnp.arange(nb) % 3

    def pick(vals, clsv):
        # vals: (3, k) responses per probe class; select row cls[b] per b.
        return jnp.where(
            clsv == 0, vals[0], jnp.where(clsv == 1, vals[1], vals[2])
        )

    D = [[None] * s for _ in range(s)]
    Lv = [[None] * s for _ in range(s)] if nb > 1 else None
    for i in range(s):
        for j in range(s):
            rows = A3[:, j, :]  # (3, n): responses for column offset j
            D[i][j] = pick(rows[:, i::s], cls)
            if nb > 1:
                # L_b[i, j] = A[(b+1)s + i, bs + j], b = 0..nb-2
                Lv[i][j] = pick(rows[:, s + i::s], cls[:-1])
    return D, Lv


def probe_gram_soa(matvec, rmatvec, n: int, s: int, dtype, damp=None):
    """SoA counterpart of :func:`probe_gram_blocks` — same 3s probe
    matvec-pairs, components extracted without the padded (nb, s, s)
    intermediate. The hot path of solver/block_cholesky.py."""
    P = block_probe_matrix(n, s, dtype)
    AV = jax.vmap(lambda v: rmatvec(matvec(v)))(P)
    if damp is not None:
        AV = AV + damp[None, :] * P
    return extract_blocks_soa(AV, n, s)


def _bcr_soa(Dv, Lv, rhs, nb, s):
    """Struct-of-arrays block cyclic reduction for s <= 2 — see
    block_cyclic_reduction_solve for the algorithm; identical algebra
    with every (s, s) block held as s*s separate (k,) arrays, and the
    last <= _CR_DENSE_TAIL_NB blocks solved as one dense Cholesky."""
    zrow = lambda a: jnp.zeros((1,) + a.shape[1:], a.dtype)
    zero1 = lambda a: jnp.concatenate([zrow(a), a], axis=0)

    # B[i] = A[i, i-1] (0 at i=0); C[i] = A[i, i+1] (0 at i=nb-1)
    if nb > 1:
        B = _soa_map(zero1, Lv, s)
        C = [[jnp.concatenate([Lv[j][i], zrow(Lv[j][i])], axis=0)
              for j in range(s)] for i in range(s)]
    else:
        dt = Dv[0][0].dtype
        B = [[jnp.zeros((nb,), dt) for _ in range(s)] for _ in range(s)]
        C = [[jnp.zeros((nb,), dt) for _ in range(s)] for _ in range(s)]
    r = [rhs[i::s] for i in range(s)]

    def even(a):
        return a[0::2]

    def odd(a):
        return a[1::2]

    def shift_down(a, count):
        z = jnp.zeros((1,), a.dtype)
        return jnp.concatenate([z, a[: count - 1]], axis=0)

    def pad_to(a, count):
        k = a.shape[0]
        if k == count:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((count - k,), a.dtype)], axis=0
        )

    def dense_tail_solve(Dv, B, C, r, k):
        """Assemble the reduced k-block system dense and solve it with
        one Cholesky: below ~tile size the remaining log2(k) reduction
        levels are pure op-launch latency (halving (k,) elementwise
        passes), while a (k*s, k*s) dense solve is a single fused kernel.
        Uses B (sub-diagonal) only — the system is symmetric."""
        Dm = jnp.stack(
            [jnp.stack([Dv[i][j] for j in range(s)], -1) for i in range(s)],
            -2,
        )  # (k, s, s)
        Bm = jnp.stack(
            [jnp.stack([B[i][j] for j in range(s)], -1) for i in range(s)],
            -2,
        )
        idx = jnp.arange(k)
        A = jnp.zeros((k, s, k, s), Dm.dtype)
        A = A.at[idx, :, idx, :].set(Dm)
        if k > 1:
            A = A.at[idx[1:], :, idx[:-1], :].set(Bm[1:])
            A = A.at[idx[:-1], :, idx[1:], :].set(
                jnp.swapaxes(Bm[1:], -1, -2)
            )
        A = A.reshape(k * s, k * s)
        rv = jnp.stack(r, axis=-1).reshape(k * s)
        Lc = jnp.linalg.cholesky(A)
        from jax.scipy.linalg import solve_triangular as _st

        x = _st(Lc.T, _st(Lc, rv, lower=True), lower=False)
        xs = x.reshape(k, s)
        return [xs[:, i] for i in range(s)]

    stack = []
    k = nb
    while k > _CR_DENSE_TAIL_NB:
        De = _soa_map(even, Dv, s); Do = _soa_map(odd, Dv, s)
        Be = _soa_map(even, B, s); Bo = _soa_map(odd, B, s)
        Ce = _soa_map(even, C, s); Co = _soa_map(odd, C, s)
        re = [even(x) for x in r]; ro = [odd(x) for x in r]
        ke = De[0][0].shape[0]
        Dinv_o = _soa_inv(Do, s)
        stack.append((Dinv_o, Bo, Co, ro, ke))
        sl = lambda a: shift_down(a, ke)
        pr = lambda a: pad_to(a, ke)
        DinvL = _soa_map(sl, Dinv_o, s)
        BoL = _soa_map(sl, Bo, s)
        CoL = _soa_map(sl, Co, s)
        roL = [sl(x) for x in ro]
        DinvR = _soa_map(pr, Dinv_o, s)
        BoR = _soa_map(pr, Bo, s)
        CoR = _soa_map(pr, Co, s)
        roR = [pr(x) for x in ro]
        TL = _soa_mm(Be, DinvL, s)
        TR = _soa_mm(Ce, DinvR, s)
        Dv = _soa_sub(_soa_sub(De, _soa_mm(TL, CoL, s), s),
                      _soa_mm(TR, BoR, s), s)
        B = _soa_mm(TL, BoL, s, neg=True)
        C = _soa_mm(TR, CoR, s, neg=True)
        tl_r = _soa_mv(TL, roL, s)
        tr_r = _soa_mv(TR, roR, s)
        r = [re[i] - tl_r[i] - tr_r[i] for i in range(s)]
        k = ke
    if k > 1:
        x = dense_tail_solve(Dv, B, C, r, k)
    else:
        x = _soa_mv(_soa_inv(Dv, s), r, s)
    for Dinv_o, Bo, Co, ro, ke in reversed(stack):
        ko = Dinv_o[0][0].shape[0]
        x_left = [xc[:ko] for xc in x]
        x_right = [pad_to(xc[1:], ko) for xc in x]
        bl = _soa_mv(Bo, x_left, s)
        cr_ = _soa_mv(Co, x_right, s)
        xo = _soa_mv(Dinv_o, [ro[i] - bl[i] - cr_[i] for i in range(s)], s)
        k_full = ke + ko
        x = [
            jnp.zeros((k_full,), xc.dtype).at[0::2].set(xc).at[1::2].set(xoc)
            for xc, xoc in zip(x, xo)
        ]
    return jnp.stack(x, axis=-1).reshape(nb * s)


def block_cyclic_reduction_solve(D: jnp.ndarray, L: jnp.ndarray,
                                 rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve the SPD block-tridiagonal ``A x = rhs`` by block cyclic
    reduction: eliminate the odd block rows in parallel, halving the
    system per level — ceil(log2(nb)) levels of BATCHED (s, s) work
    instead of the scan factorization's nb sequential steps. This is the
    TPU-native shape for large nb (the scan's tiny sequential steps are
    latency-bound on the systolic pipeline); classic trade-off: ~2x the
    flops of the LBL' factorization, fully parallel within each level.

    At s <= 2 the blocks are held struct-of-arrays (s*s separate (k,)
    component arrays, closed-form inverses — see _soa_split for the
    layout rationale and the measured launch-overhead bound), and the
    last <= _CR_DENSE_TAIL_NB blocks are solved as one dense Cholesky.

    Unpivoted block elimination in a reordered order — same stability
    class as the scan route on the SPD (damped-Gram) systems this module
    serves. Levels are unrolled at trace time (nb static)."""
    nb, s = D.shape[0], D.shape[-1]
    if s <= 2:
        Dv = _soa_split(D)
        Lv = _soa_split(L) if nb > 1 else None
        return _bcr_soa(Dv, Lv, rhs, nb, s)
    # Per-row couplings: B[i] = A[i, i-1] (0 at i=0), C[i] = A[i, i+1]
    # (0 at i=nb-1). Symmetric: C[i] = B[i+1]'.
    zero = jnp.zeros((1, s, s), D.dtype)
    B = jnp.concatenate([zero, L], axis=0)
    C = jnp.concatenate([jnp.swapaxes(L, -1, -2), zero], axis=0)
    r = rhs.reshape(nb, s)

    stack = []
    k = nb
    while k > 1:
        De, Do = D[0::2], D[1::2]
        Be, Bo = B[0::2], B[1::2]
        Ce, Co = C[0::2], C[1::2]
        re, ro = r[0::2], r[1::2]
        ke, ko = De.shape[0], Do.shape[0]
        Dinv_o = _binv(Do)
        stack.append((Dinv_o, Bo, Co, ro, ke))
        # Left odd neighbor of even j is odd j-1 (absent at j=0, where
        # Be[0] = B[0] = 0 kills the term); right odd neighbor is odd j
        # (absent for the last even row of an odd-length level, where
        # Ce[-1] = C[k-1] = 0 kills it — the zero-coupling edge blocks
        # make every edge case algebraic instead of branched).
        DinvL = _shift_down(Dinv_o, ke)
        BoL = _shift_down(Bo, ke)
        CoL = _shift_down(Co, ke)
        roL = _shift_down(ro, ke)
        DinvR = _pad_to(Dinv_o, ke)
        BoR = _pad_to(Bo, ke)
        CoR = _pad_to(Co, ke)
        roR = _pad_to(ro, ke)
        TL = Be @ DinvL  # (ke, s, s)
        TR = Ce @ DinvR
        D = De - TL @ CoL - TR @ BoR
        B = -TL @ BoL
        C = -TR @ CoR
        r = (
            re
            - jnp.einsum("kij,kj->ki", TL, roL)
            - jnp.einsum("kij,kj->ki", TR, roR)
        )
        k = ke
    x = jnp.einsum("kij,kj->ki", _binv(D), r)
    for Dinv_o, Bo, Co, ro, ke in reversed(stack):
        ko = Dinv_o.shape[0]
        xe = x  # (ke, s) solutions at this level's even rows
        x_left = xe[:ko]  # even j is odd j's left neighbor
        x_right = _pad_to(xe[1:], ko)  # even j+1; absent edge has Co = 0
        xo = jnp.einsum(
            "kij,kj->ki",
            Dinv_o,
            ro
            - jnp.einsum("kij,kj->ki", Bo, x_left)
            - jnp.einsum("kij,kj->ki", Co, x_right),
        )
        k_full = ke + ko
        x = jnp.zeros((k_full, s), x.dtype).at[0::2].set(xe).at[1::2].set(xo)
    return x.reshape(nb * s)


# Above this block count the scan factorization's sequential tiny steps
# are latency-bound on TPU and cyclic reduction's log2(nb) batched levels
# win; below it the scan's lower flop count and LBL' stability are free.
_CYCLIC_REDUCTION_MIN_NB = 64


def solve_block_tridiag_spd_soa(Dv, Lv, rhs, nb: int, s: int):
    """SoA-input counterpart of :func:`solve_block_tridiag_spd` (cyclic
    reduction only, s <= 2): same (near-)semidefinite jittered-retry
    contract, block components straight from :func:`probe_gram_soa` —
    the padded (nb, s, s) intermediate never exists."""
    n = nb * s
    dt = Dv[0][0].dtype
    eps = float(jnp.finfo(dt).eps)
    dx = _bcr_soa(Dv, Lv, rhs, nb, s)

    def fallback():
        diag_mean = sum(jnp.mean(Dv[i][i]) for i in range(s)) / s
        floor = eps * jnp.maximum(diag_mean, 1.0)
        Dj = [
            [
                Dv[i][j] + (100.0 * n * eps) * (Dv[i][j] + floor)
                if i == j
                else Dv[i][j]
                for j in range(s)
            ]
            for i in range(s)
        ]
        return _bcr_soa(Dj, Lv, rhs, nb, s)

    return jax.lax.cond(jnp.all(jnp.isfinite(dx)), lambda: dx, fallback)


def solve_block_tridiag_spd(D, L, rhs, method: str = "auto"):
    """Factor-and-solve with the same (near-)semidefinite fallback
    contract as the dense route (solver/cholesky._solve_spd): if the
    unjittered solve yields a non-finite step, retry once with the
    scale-invariant Tikhonov jitter on the block diagonals — the banded
    stand-in for pivoted pstrf truncation.

    ``method``: "scan" (sequential blocked LBL' Cholesky), "cr" (block
    cyclic reduction — parallel levels), or "auto" (cr above
    ``_CYCLIC_REDUCTION_MIN_NB`` block rows)."""
    nb, s = D.shape[0], D.shape[-1]
    n = nb * s
    if method == "auto":
        method = "cr" if nb > _CYCLIC_REDUCTION_MIN_NB else "scan"
    if method == "scan":
        solve = lambda Dm: block_tridiag_solve(
            *block_tridiag_cholesky(Dm, L), rhs
        )
    elif method == "cr":
        solve = lambda Dm: block_cyclic_reduction_solve(Dm, L, rhs)
    else:
        raise ValueError(
            f"method must be 'auto', 'scan' or 'cr', got {method!r}"
        )
    eps = float(jnp.finfo(D.dtype).eps)
    dx = solve(D)

    def fallback():
        diag = jnp.diagonal(D, axis1=-2, axis2=-1)  # (nb, s)
        floor = eps * jnp.maximum(jnp.mean(diag), 1.0)
        jitter = (100.0 * n * eps) * (diag + floor)
        return solve(D + jitter[..., None] * jnp.eye(s, dtype=D.dtype))

    return jax.lax.cond(jnp.all(jnp.isfinite(dx)), lambda: dx, fallback)
