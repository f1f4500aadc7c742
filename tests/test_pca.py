"""Integer power-iteration PCA (operators/pca.py): convergence on a
constructed anisotropic fixture, exact-spec parity against an
independent pure-Python reimplementation, and the projection's
map-only contract."""

import math
import random

import pytest

from sea_express_customs_etl_spark.operators.pca import (
    MICRO,
    _sdiv,
    pca_power_train,
    pca_project,
)


def _fixture(n=60, dim=8, seed=7):
    """Anisotropic cloud: a dominant direction u with strong variance
    plus small deterministic off-axis noise — eigengap >> 1, so five
    power rounds must converge."""
    rng = random.Random(seed)
    u = [math.sin(j + 1) for j in range(dim)]
    norm = math.sqrt(sum(x * x for x in u))
    u = [x / norm for x in u]
    rows = []
    for i in range(n):
        t = rng.uniform(-1, 1) * 0.5
        vec = [
            t * u[j] + 0.01 * math.sin(17 * (i + 1) * (j + 2))
            for j in range(dim)
        ]
        rows.append((i, [float(x) for x in vec]))
    return rows


def _train_pure(rows, rounds=5):
    """Independent reimplementation of the integer spec (no Spark):
    quantize, signed-DIV center, per round d/w/max-norm rescale."""
    n = len(rows)
    dim = len(rows[0][1])
    xq = [
        [int(_round_half_up(x * MICRO)) for x in vec] for _, vec in rows
    ]
    mu = [_sdiv(sum(r[j] for r in xq), n) for j in range(dim)]
    xc = [[r[j] - mu[j] for j in range(dim)] for r in xq]
    v = [MICRO] * dim
    for _ in range(rounds):
        d = [_sdiv(sum(r[j] * v[j] for j in range(dim)), MICRO) for r in xc]
        w = [
            sum(xc[i][j] * d[i] for i in range(n)) for j in range(dim)
        ]
        m = max(abs(x) for x in w)
        v = [_sdiv(w[j] * MICRO, m) for j in range(dim)]
    return v, mu


def _round_half_up(x: float) -> int:
    # Spark/DuckDB round: half away from zero
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def test_power_train_matches_pure_python_spec(spark):
    rows = _fixture()
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>"
    )
    v, mu = pca_power_train(df, rounds=5)
    # float32 storage: quantize from the float32-widened values, as
    # Spark and DuckDB both do
    import struct

    rows32 = [
        (i, [struct.unpack("f", struct.pack("f", x))[0] for x in vec])
        for i, vec in rows
    ]
    ev, emu = _train_pure(rows32, rounds=5)
    assert mu == emu
    assert v == ev


def test_converges_on_anisotropic_fixture(spark):
    rows = _fixture()
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>"
    )
    v, _ = pca_power_train(df, rounds=5)
    # compare direction against exact numpy top eigenvector
    np = pytest.importorskip("numpy")
    X = np.array([vec for _, vec in rows], dtype=np.float64)
    Xq = np.round(X * MICRO)
    Xc = Xq - np.floor_divide(Xq.sum(0), len(rows))  # close enough for cos
    _, U = np.linalg.eigh(Xc.T @ Xc)
    top = U[:, -1]
    vv = np.array(v, dtype=float)
    cos = abs(vv @ top) / (np.linalg.norm(vv) * np.linalg.norm(top))
    assert cos > 0.999
    assert max(abs(x) for x in v) == MICRO  # max-norm invariant


def test_projection_is_centered_dot(spark):
    rows = _fixture(n=10)
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>"
    )
    v, mu = pca_power_train(df, rounds=2)
    got = {r.vec_id: r.proj_u6 for r in pca_project(df, v, mu).collect()}
    import struct

    for i, vec in rows:
        vec32 = [struct.unpack("f", struct.pack("f", x))[0] for x in vec]
        xq = [int(_round_half_up(x * MICRO)) for x in vec32]
        dot = sum((xq[j] - mu[j]) * v[j] for j in range(len(v)))
        assert got[i] == _sdiv(dot, MICRO)
    # map-only contract: no shuffle exchange in the projection plan
    plan = pca_project(df, v, mu)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_label_anova_matches_hand_formula(spark):
    from sea_express_customs_etl_spark.operators.pca import pca_label_anova

    rows = _fixture(n=40)
    labeled = [(i, vec, i % 4) for i, vec in rows]
    df = spark.createDataFrame(
        labeled, "vec_id int, embedding array<float>, label int"
    )
    v, mu = pca_power_train(df, rounds=3)
    proj = {
        r.vec_id: r.proj_u6 for r in pca_project(df, v, mu).collect()
    }
    groups = {}
    for i, _, lab in labeled:
        groups.setdefault(lab, []).append(proj[i])
    means = {g: _sdiv(sum(ps), len(ps)) for g, ps in groups.items()}
    allp = list(proj.values())
    gmean = _sdiv(sum(allp), len(allp))
    ssw = sum(
        (p - means[g]) ** 2 for g, ps in groups.items() for p in ps
    )
    ssb = sum(len(ps) * (means[g] - gmean) ** 2 for g, ps in groups.items())
    k, n = len(groups), len(allp)
    f = ssb * (n - k) * 1_000_000 // ((k - 1) * ssw)
    row = pca_label_anova(df, v, mu).collect()[0]
    assert (row.k, row.n, row.ssb, row.ssw, row.f_u6) == (
        k,
        n,
        ssb,
        ssw,
        f,
    )
