"""Marginal-cost ablation of snappy_pallas_mt: double sections, time on real
chip, divide by reported steps. cost(section) ~ t(doubled) - t(base)."""
import importlib.util
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

SRC = open("/root/repo/aircompressor_tpu/ops/snappy_pallas_mt.py").read()

# ---- sections to double ----
FAR_ORIG = """                ia = in_ref[pl.ds(r * Rc + qi0, 1), :]
                ib = in_ref[pl.ds(r * Rc + qi1, 1), :]
                oa = out_ref[pl.ds(r * OUT_ROWSP + qo0, 1), :]
                ob = out_ref[pl.ds(r * OUT_ROWSP + qo1, 1), :]
                rows_a.append(jnp.where(ui > 0, ia, oa))
                rows_b.append(jnp.where(ui > 0, ib, ob))"""
FAR_DOUBLE = """                ia = in_ref[pl.ds(r * Rc + qi0, 1), :]
                ib = in_ref[pl.ds(r * Rc + qi1, 1), :]
                oa = out_ref[pl.ds(r * OUT_ROWSP + qo0, 1), :]
                ob = out_ref[pl.ds(r * OUT_ROWSP + qo1, 1), :]
                qi2 = jnp.clip(qq + 2, 0, Rc - 1)
                qi3 = jnp.clip(qq + 3, 0, Rc - 1)
                qo2 = jnp.clip(qq + 2, 0, OUT_ROWS - 1)
                qo3 = jnp.clip(qq + 3, 0, OUT_ROWS - 1)
                live = qq < -1
                xa = jnp.where(ui > 1, in_ref[pl.ds(r * Rc + qi2, 1), :],
                               out_ref[pl.ds(r * OUT_ROWSP + qo2, 1), :])
                xb = jnp.where(ui > 1, in_ref[pl.ds(r * Rc + qi3, 1), :],
                               out_ref[pl.ds(r * OUT_ROWSP + qo3, 1), :])
                rows_a.append(jnp.where(live, xa, jnp.where(ui > 0, ia, oa)))
                rows_b.append(jnp.where(live, xb, jnp.where(ui > 0, ib, ob)))"""

GATH_ORIG = """            spos = q + lane - o  # absolute source byte for output lane
            v_far = gather2(La, Lb, (spos - (qr << 7)) & 255)
            v_hdr = gather2(Ha, Hb, (spos - hbase) & 255)
            reg_base = (wrow - 1) << 7
            v_reg = gather2(prev, tile, (spos - reg_base) & 255)"""
GATH_DOUBLE = """            spos = q + lane - o  # absolute source byte for output lane
            v_far = gather2(La, Lb, (spos - (qr << 7)) & 255)
            v_hdr = gather2(Ha, Hb, (spos - hbase) & 255)
            reg_base = (wrow - 1) << 7
            v_reg = gather2(prev, tile, (spos - reg_base) & 255)
            v_far2 = gather2(Lb, La, (spos - (qr << 7) + 1) & 255)
            v_hdr2 = gather2(Hb, Ha, (spos - hbase + 1) & 255)
            v_reg2 = gather2(tile, prev, (spos - reg_base + 1) & 255)
            v_far = jnp.where(q < -999, v_far2 + v_hdr2 + v_reg2, v_far)"""

PARSE_ORIG = """            ttype = tag & 3
            n = tag >> 2"""
PARSE_DOUBLE = """            ttype = tag & 3
            n = tag >> 2
            _n2 = (tag + b4) >> 2
            _le2 = jnp.clip(_n2 - 59, 0, 4)
            _e2 = jnp.where(
                _le2 == 0, _n2 + 1,
                jnp.where(
                    _le2 == 1, b1 + 1,
                    jnp.where(
                        _le2 == 2, (b1 | (b2 << 8)) + 1,
                        jnp.where(
                            _le2 == 3, (b1 | (b2 << 8) | (b3 << 16)) + 1,
                            (b1 | (b2 << 8) | (b3 << 16) | (b4 << 24)) + 1,
                        ),
                    ),
                ),
            )
            _c1l2 = 4 + ((tag >> 2) & 7)
            _c1d2 = ((tag >> 5) << 8) | b2
            _c2l2 = _n2 + 1
            _c2d2 = b2 | (b3 << 8)
            _c4d2 = b2 | (b3 << 8) | (b4 << 16)
            _cpl2 = jnp.where(ttype == 1, _c1l2, _c2l2)
            _cpd2 = jnp.where(
                ttype == 1, _c1d2, jnp.where(ttype == 2, _c2d2, _c4d2))
            n = jnp.where(b4 > 999, _e2 + _cpl2 + _cpd2, n)"""

PK_ORIG = """            hs = ip - hbase
            pk = gather2(Ha, Hb, hs[:, 0:1] + jnp.minimum(lane, 5))
            tag = _rep(pk[:, 0:1])
            b1 = _rep(pk[:, 1:2])
            b2 = _rep(pk[:, 2:3])
            b3 = _rep(pk[:, 3:4])
            b4 = _rep(pk[:, 4:5])"""
PK_DOUBLE = """            hs = ip - hbase
            pk = gather2(Ha, Hb, hs[:, 0:1] + jnp.minimum(lane, 5))
            pk2 = gather2(Hb, Ha, hs[:, 0:1] + jnp.minimum(lane, 4))
            pk = jnp.where(hs < -999, pk2, pk)
            tag = _rep(pk[:, 0:1])
            b1 = _rep(pk[:, 1:2])
            b2 = _rep(pk[:, 2:3])
            b3 = _rep(pk[:, 3:4])
            b4 = _rep(pk[:, 4:5])
            tag = jnp.where(hs > 999999, _rep(pk[:, 5:6]) + _rep(pk[:, 6:7])
                            + _rep(pk[:, 7:8]) + _rep(pk[:, 8:9]), tag)"""

VARIANTS = {
    "base": [],
    "far2x": [(FAR_ORIG, FAR_DOUBLE)],
    "gath2x": [(GATH_ORIG, GATH_DOUBLE)],
    "parse2x": [(PARSE_ORIG, PARSE_DOUBLE)],
    "pk2x": [(PK_ORIG, PK_DOUBLE)],
}


def load_variant(name, subs):
    src = SRC
    for old, new in subs:
        assert old in src, f"{name}: pattern missing"
        src = src.replace(old, new)
    path = f"/tmp/mt_{name}.py"
    open(path, "w").write(src)
    spec = importlib.util.spec_from_file_location(f"mt_{name}", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _pack(blobs):
    cap = max(len(b) for b in blobs) + 1
    cap += (-cap) % 1024
    buf = np.zeros((len(blobs), cap), np.uint8)
    lens = np.zeros(len(blobs), np.int32)
    for i, b in enumerate(blobs):
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    return jnp.asarray(buf), jnp.asarray(lens)


from aircompressor_tpu.snappy import SnappyCompressor

d = open("/root/reference/testdata/urls.10K", "rb").read()
raws = [d[lo: lo + 65536] for lo in range(0, 65536 * 32, 65536) if lo < len(d)]
raws = (raws * 8)[:32]
comp = SnappyCompressor.create()
blobs = [comp.compress(r) for r in raws]
buf, lens = _pack(blobs)
total = sum(len(r) for r in raws)

res = {}
for name, subs in VARIANTS.items():
    m = load_variant(name, subs)
    out, olens, ok, steps = m.decode(buf, lens, with_steps=True)
    okh, st = np.asarray(ok), int(np.asarray(steps)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, olens, _, _ = m.decode(buf, lens, with_steps=True)
        _ = np.asarray(olens)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    per = t / st * 1e9
    res[name] = per
    print(f"{name}: ok={okh.all()} steps={st} t={t*1e3:.2f}ms "
          f"{per:.0f}ns/iter  {per - res.get('base', 0):+.0f}ns", flush=True)
