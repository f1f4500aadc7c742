"""Fellegi-Sunter EM linkage (operators/fellegi_sunter.py): the full
integer trajectory against a pure-Python replica, and the
planted-duplicates sanity (EM finds m >> u when real near-dupes
exist)."""

from sea_express_customs_etl_spark.operators.fellegi_sunter import (
    U6,
    _clamp,
    fs_em_train,
    part_pair_gammas,
)


def _parts():
    """20 parts in one brand: 5 planted near-duplicate PAIRS (agree
    on everything) + 10 singletons that mostly disagree."""
    rows = []
    k = 0
    for d in range(5):
        for copy in range(2):
            rows.append(
                (k, f"alpha part {d}", "B1", 10 + d,
                 f"TYPE{d}", 900.0 + 10 * d)
            )
            k += 1
    for s in range(10):
        rows.append(
            (k, f"zeta{s} widget", "B1", 40 + s,
             f"SOLO{s}", 950.0 + 3.7 * s)
        )
        k += 1
    return rows


def _pure_em(gammas, rounds=3, p0=100_000, m0=900_000, u0=100_000):
    feats = range(4)
    p, m, u = p0, [m0] * 4, [u0] * 4
    traj = []
    for t in range(1, rounds + 1):
        sw, n = 0, 0
        swg, svg = [0] * 4, [0] * 4
        for g in gammas:
            num = p
            den2 = U6 - p
            for f in feats:
                num *= m[f] if g[f] else U6 - m[f]
                den2 *= u[f] if g[f] else U6 - u[f]
            w = num * U6 // (num + den2)
            sw += w
            n += 1
            for f in feats:
                if g[f]:
                    swg[f] += w
                    svg[f] += U6 - w
        sv = n * U6 - sw
        p = _clamp(sw // n)
        m = [_clamp(swg[f] * U6 // max(sw, 1)) for f in feats]
        u = [_clamp(svg[f] * U6 // max(sv, 1)) for f in feats]
        for f in feats:
            traj.append((t, f + 1, m[f], u[f], p))
    return traj


def test_em_matches_pure_replica_and_finds_planted_dupes(spark):
    df = spark.createDataFrame(
        _parts(),
        "p_partkey int, p_name string, p_brand string, p_size int,"
        " p_type string, p_retailprice double",
    )
    gam = [
        (r.g1, r.g2, r.g3, r.g4)
        for r in part_pair_gammas(df)
        .orderBy("id_a", "id_b")
        .collect()
    ]
    assert len(gam) == 20 * 19 // 2
    got = sorted(
        (r.round, r.feature, r.m_u6, r.u_u6, r.p_u6)
        for r in fs_em_train(df, rounds=3).collect()
    )
    assert got == sorted(_pure_em(gam))
    # planted structure: by round 3 every feature separates, m >> u
    final = {f: (m, u) for t, f, m, u, _ in got if t == 3}
    for f, (m, u) in final.items():
        assert m > u, f
