"""Zstd device ENCODE tier — host planner + one jitted device emission.

Reference analogue: ZstdNative compress (zstd/ZstdNative.java:27-41) — the
device stands in for the native library behind the same batch interface,
with graceful host-tier fallback (internal/NativeLoader.java:104-112).

Split of labor (SURVEY §2.8 + VERDICT r2 #6, entropy-first):
- DEVICE (optional, one Pallas launch over the batch): DFAST match
  finding (ops/zstd_dfast_pallas). Its proposals are VERIFIED on host —
  every claimed match is checked element-wise against the data
  (the LZ77 soundness condition data[j] == data[j - offset], which is
  exact even for overlapping copies) — and any chunk that fails
  verification falls back to the host matcher, so a device miscompile
  can never corrupt output. Toggle: AIRCOMPRESSOR_TPU_ZSTD_DEVICE_MATCHER
  (default on; set to 0 to force the host matcher).
- HOST: fallback DFAST match finding (zstd/block_enc.find_sequences — a
  vectorized numpy matcher), histogram, Huffman/FSE table BUILD and
  serialization, mode selection, headers, frame assembly. These are small
  per-block scalar decisions and table constructions.
- DEVICE (one jit, batched over chunks): the entropy HOT LOOPS — the
  4-stream Huffman literal emission (per-symbol code/length gathers in
  reverse order) and the interleaved 3-state reverse FSE sequence walk
  (lax.scan across sequences, chunks batched in lanes), both feeding a
  vectorized backward bit-packer (disjoint bit ranges -> per-byte
  contributions combine by scatter-ADD; zstd/bits.pack_backward's
  formulation, expressed in jnp).

Output contract: with the device matcher DISABLED the output is
BIT-IDENTICAL to the host tier's (same sequences, same tables, same
emission order). With the device matcher active, chunks it handles may
pick different (verified-sound) matches than the host matcher, so the
guarantee is decodability + competitive size rather than bit-identity;
every frame still carries the xxh64 content checksum. Chunks that exceed
the launch geometry (sequence count, literal size) or whose blocks pick
non-4-stream literal layouts fall back to the host tier per chunk.
"""

from __future__ import annotations

import os

import numpy as np

from ..zstd import block_enc
from ..zstd import constants as C
from ..zstd import frame_enc, huff_enc, seq_enc
from ..zstd.params import compute as _params

LANES = 128
B_PER_LAUNCH = 32  # chunks per device launch
LIT_CAP = 65536  # literal bytes per block
SEG_CAP = LIT_CAP // 4  # symbols per huffman stream
LSTREAM_CAP = 24576  # bytes per packed huffman stream (16384*11 bits + mark)
S_CAP = 8192  # sequences per block (64KB / min-match-8 typical ceiling)
OPS_CAP = 3 + 6 * S_CAP + 3
SSTREAM_CAP = 98304  # bytes per packed sequences bitstream
NS_CAP = 512  # FSE next_state rows (table_log <= 9)
SYM_CAP = 64  # FSE symbols per field (LL 36, OF 32, ML 53)

# Device DFAST matcher opt-out (the host verifies every device-proposed
# match before use, so this is a performance toggle, not a safety one).
USE_DEVICE_MATCHER = os.environ.get(
    "AIRCOMPRESSOR_TPU_ZSTD_DEVICE_MATCHER", "1").strip().lower() not in (
    "0", "false", "no", "off", "")

_MATCHER_QUALIFIED: bool | None = None
_FORCE_MATCHER = False  # test hook: bypass backend check + qualification


def _verify_proposals(data: np.ndarray, ll: np.ndarray, ml: np.ndarray,
                      of: np.ndarray, last: int, min_match: int) -> bool:
    """Full soundness check of matcher proposals against ``data``:
    structure (non-negative lit lens, match lens >= min_match, offsets in
    range, coverage == len) and content (data[j] == data[j - offset]
    across every match span — exact LZ77 incl. overlapping copies)."""
    if (ll < 0).any() or (ml < min_match).any() or (of <= 0).any():
        return False
    if int(ll.sum() + ml.sum()) + last != data.size:
        return False
    pos = np.cumsum(np.concatenate([[0], (ll + ml)[:-1]]))
    if (of > pos + ll).any():
        return False
    seg0 = np.cumsum(ml) - ml
    span = np.arange(int(ml.sum()), dtype=np.int64)
    dst = np.repeat(pos + ll, ml) + (span - np.repeat(seg0, ml))
    return bool(np.array_equal(data[dst], data[dst - np.repeat(of, ml)]))


def _matcher_qualified() -> bool:
    """One-time backend qualification of the Pallas DFAST matcher: on a
    representative 64KB mixed payload its proposals must be sound AND find
    a comparable match volume to the host matcher. On current-Mosaic TPU
    the kernel compiles to a divergent program (the DESIGN.md §8.4
    wide-state family: sound matches but ~5x fewer of them), so this gate
    keeps real hardware on the host matcher — preserving the host tier's
    size guarantee — while interpret-mode backends use the kernel."""
    global _MATCHER_QUALIFIED
    if _MATCHER_QUALIFIED is not None:
        return _MATCHER_QUALIFIED
    try:
        import jax.numpy as jnp

        from . import zstd_dfast_pallas as dk
        from .batch import _selfcheck_payload

        payload = np.frombuffer(_selfcheck_payload(seed=0xDFA5), np.uint8)
        buf = jnp.asarray(payload[None, :])
        ll, ml, of, nseq, last, ok = dk.find_sequences_batch(
            buf, jnp.asarray(np.array([payload.size], np.int32)))
        m = int(np.asarray(nseq)[0])
        if not bool(np.asarray(ok)[0]) or m == 0:
            _MATCHER_QUALIFIED = False
            return False
        ll_n = np.asarray(ll)[0, :m].astype(np.int64)
        ml_n = np.asarray(ml)[0, :m].astype(np.int64)
        of_n = np.asarray(of)[0, :m].astype(np.int64)
        sound = _verify_proposals(payload, ll_n, ml_n, of_n,
                                  int(np.asarray(last)[0]), dk.MIN_MATCH)
        host_cov = int(block_enc.find_sequences(
            payload, _params(3, payload.size))[2].sum())
        _MATCHER_QUALIFIED = bool(
            sound and int(ml_n.sum()) >= 0.7 * host_cov)
    except Exception:  # noqa: BLE001 - qualification failure = host tier
        _MATCHER_QUALIFIED = False
    return _MATCHER_QUALIFIED


# ------------------------------------------------------------------ device
def _pack_bits(vals, nbits, cap_bytes):
    """jnp pack_backward: ops appended LSB-first in order + end-mark bit.

    vals/nbits: (B, N) i32 with nbits==0 for padding (any position — ops of
    zero width do not advance the cursor, so fixed-slot layouts with masked
    slots produce the same stream as a compacted op list). Returns
    (bytes (B, cap) i32 0..255, total_bits (B,))."""
    import jax.numpy as jnp

    B = vals.shape[0]
    vals = vals & ((1 << nbits) - 1)
    offs = jnp.cumsum(nbits, axis=1) - nbits  # exclusive
    total = offs[:, -1] + nbits[:, -1]
    byte0 = offs >> 3
    shift = offs & 7
    shifted = vals << shift  # <= 18+7 bits, fits i32
    buf = jnp.zeros((B * cap_bytes,), jnp.int32)
    rowbase = (jnp.arange(B, dtype=jnp.int32) * cap_bytes)[:, None]
    for k in range(4):  # spans <= ceil((18+7)/8)+1
        contrib = (shifted >> (8 * k)) & 0xFF
        idx = rowbase + jnp.minimum(byte0 + k, cap_bytes - 1)
        buf = buf.at[idx.reshape(-1)].add(
            contrib.reshape(-1), mode="drop")
    # end-mark bit at bit `total`
    mark_idx = (jnp.arange(B, dtype=jnp.int32) * cap_bytes
                + jnp.minimum(total >> 3, cap_bytes - 1))
    buf = buf.at[mark_idx].add(1 << (total & 7), mode="drop")
    return buf.reshape(B, cap_bytes), total


def _emit_device(lit, lit_seg, hcodes, hbits,
                 llc, mlc, ofc, llx, mlx, ofx, llxb, mlxb, ofxb, nseq,
                 ll_dnb, ll_dfs, ll_ns, ml_dnb, ml_dfs, ml_ns,
                 of_dnb, of_dfs, of_ns, flush_bits):
    """One launch: 4 huffman streams + the sequences bitstream per chunk.

    lit (B, LIT_CAP) i32 bytes; lit_seg (B, 4, 2) [start, count) per stream;
    h{codes,bits} (B,256); {ll,ml,of}{c,x,xb} (B,S_CAP) codes/extras;
    *_dnb/_dfs (B,SYM_CAP), *_ns (B,NS_CAP); flush_bits (B,3) table logs
    in flush order [ml, of, ll]."""
    import jax
    import jax.numpy as jnp

    B = lit.shape[0]

    # ---- huffman streams: symbols in reverse order per segment
    lit_bytes = []
    lit_totals = []
    j = jnp.arange(SEG_CAP, dtype=jnp.int32)[None, :]
    for s in range(4):
        start = lit_seg[:, s, 0:1]
        cnt = lit_seg[:, s, 1:2]
        idx = jnp.clip(start + cnt - 1 - j, 0, LIT_CAP - 1)
        sym = jnp.take_along_axis(lit, idx, axis=1)
        v = jnp.take_along_axis(hcodes, sym, axis=1)
        nb = jnp.where(j < cnt, jnp.take_along_axis(hbits, sym, axis=1), 0)
        by, tot = _pack_bits(v, nb, LSTREAM_CAP)
        lit_bytes.append(by)
        lit_totals.append(tot)

    # ---- sequences: reverse 3-state walk (scan over steps, chunks in lanes)
    last = jnp.maximum(nseq - 1, 0)[:, None]  # (B,1)

    def init_state(codes, dnb, dfs, ns):
        c0 = jnp.take_along_axis(codes, last, axis=1)
        d0 = jnp.take_along_axis(dnb, c0, axis=1)
        f0 = jnp.take_along_axis(dfs, c0, axis=1)
        nb0 = (d0 + (1 << 15)) >> 16
        sub = ((nb0 << 16) - d0) >> nb0
        return jnp.take_along_axis(ns, jnp.clip(sub + f0, 0, NS_CAP - 1),
                                   axis=1)

    st_of = init_state(ofc, of_dnb, of_dfs, of_ns)
    st_ml = init_state(mlc, ml_dnb, ml_dfs, ml_ns)
    st_ll = init_state(llc, ll_dnb, ll_dfs, ll_ns)

    def step(carry, jj):
        s_of, s_ml, s_ll = carry
        i = jnp.clip(last - 1 - jj, 0, S_CAP - 1)  # (B,1)
        live = (jj < last)  # (B,1) bool: step jj encodes sequence i

        def one(st, codes, dnb, dfs, ns):
            c = jnp.take_along_axis(codes, i, axis=1)
            d = jnp.take_along_axis(dnb, c, axis=1)
            f = jnp.take_along_axis(dfs, c, axis=1)
            nb = jnp.where(live, (st + d) >> 16, 0)
            nst = jnp.take_along_axis(
                ns, jnp.clip((st >> nb) + f, 0, NS_CAP - 1), axis=1)
            nst = jnp.where(live, nst, st)
            return nst, st[:, 0], nb[:, 0]

        n_of, v_of, b_of = one(s_of, ofc, of_dnb, of_dfs, of_ns)
        n_ml, v_ml, b_ml = one(s_ml, mlc, ml_dnb, ml_dfs, ml_ns)
        n_ll, v_ll, b_ll = one(s_ll, llc, ll_dnb, ll_dfs, ll_ns)
        return (n_of, n_ml, n_ll), (v_of, b_of, v_ml, b_ml, v_ll, b_ll)

    (st_of, st_ml, st_ll), outs = jax.lax.scan(
        step, (st_of, st_ml, st_ll), jnp.arange(S_CAP, dtype=jnp.int32))
    of_v, of_b, ml_v, ml_b, ll_v, ll_b = [o.T for o in outs]  # (B, S_CAP)

    # writer-order op array (seq_enc.compress_sequences layout):
    # [ll_x, ml_x, of_x](last) + per step [ofS, mlS, llS, ll_x, ml_x, of_x]
    # + flushes [ml, of, ll]. Padded slots carry nbits=0 (order-neutral).
    jj = jnp.arange(S_CAP, dtype=jnp.int32)[None, :]
    rev = jnp.clip(last - 1 - jj, 0, S_CAP - 1)
    has = nseq[:, None] > 0
    live = jj < last

    def g(a, idx):
        return jnp.take_along_axis(a, idx, axis=1)

    head_v = jnp.stack([g(llx, last)[:, 0], g(mlx, last)[:, 0],
                        g(ofx, last)[:, 0]], axis=1)
    head_b = jnp.stack([g(llxb, last)[:, 0], g(mlxb, last)[:, 0],
                        g(ofxb, last)[:, 0]], axis=1)
    head_b = jnp.where(has, head_b, 0)
    body_v = jnp.stack([of_v, ml_v, ll_v,
                        g(llx, rev), g(mlx, rev), g(ofx, rev)],
                       axis=2).reshape(B, 6 * S_CAP)
    body_b = jnp.stack([of_b, ml_b, ll_b,
                        jnp.where(live, g(llxb, rev), 0),
                        jnp.where(live, g(mlxb, rev), 0),
                        jnp.where(live, g(ofxb, rev), 0)],
                       axis=2).reshape(B, 6 * S_CAP)
    tail_v = jnp.stack([st_ml[:, 0], st_of[:, 0], st_ll[:, 0]], axis=1)
    tail_b = jnp.where(has, flush_bits, 0)
    vals = jnp.concatenate([head_v, body_v, tail_v], axis=1)
    bits = jnp.concatenate([head_b, body_b, tail_b], axis=1)
    seq_bytes, seq_total = _pack_bits(vals, bits, SSTREAM_CAP)

    return (jnp.stack(lit_bytes, axis=1).astype(jnp.uint8),
            jnp.stack(lit_totals, axis=1),
            seq_bytes.astype(jnp.uint8), seq_total)


_EMIT = None


def _emit():
    global _EMIT
    if _EMIT is None:
        import jax

        _EMIT = jax.jit(_emit_device)
    return _EMIT


# -------------------------------------------------------------------- host
class _Plan:
    __slots__ = ("data", "ll", "ofw", "ml", "literals", "ct", "fields",
                 "device", "reason")

    def __init__(self):
        self.device = False
        self.reason = ""


def _extract_literals(data: np.ndarray, ll: np.ndarray, ml: np.ndarray,
                      last_lit: int) -> np.ndarray:
    """Vectorized gather of the literal runs (+trailing) from ``data``
    given per-sequence (lit_len, match_len) — the ragged-ranges trick."""
    ll_full = np.concatenate([ll, [last_lit]]).astype(np.int64)
    seq_adv = np.concatenate([ll + ml, [last_lit]]).astype(np.int64)
    data_starts = np.concatenate([[0], np.cumsum(seq_adv[:-1])])
    lit_starts = np.concatenate([[0], np.cumsum(ll_full[:-1])])
    total = int(ll_full.sum())
    idx = np.arange(total, dtype=np.int64)
    delta = np.repeat(data_starts - lit_starts, ll_full)
    return data[idx + delta]


def _device_matcher_batch(chunks, level: int):
    """Run the DFAST Pallas matcher over the whole batch in one launch;
    returns per-chunk (ll, offsets, ml, literals) or None (fallback).
    Level-3-only (the kernel implements the dfast strategy).

    Every device proposal is VERIFIED on host before use: structure
    (non-negative lit lens, match lens >= MIN_MATCH, offsets in range,
    coverage == chunk length) AND content — each claimed match must
    satisfy data[j] == data[j - offset] across its span, which is the
    exact LZ77 soundness condition including overlapping copies. A chunk
    failing any check falls back to the host matcher, so a device
    miscompile degrades throughput, never correctness."""
    if level != 3 or not USE_DEVICE_MATCHER:
        return [None] * len(chunks)
    if not _FORCE_MATCHER:
        import jax

        # Off-TPU the kernel runs in interpret mode: slower than the
        # numpy host matcher AND ~2.6% worse ratio (no ip+1 long probe) —
        # no reason to use it there. On TPU it must additionally pass
        # qualification (currently failing on the Mosaic divergence, so
        # the matcher is dormant until the lowering is fixed; tests force
        # it via _FORCE_MATCHER and exercise the kernel directly).
        if jax.default_backend() != "tpu" or not _matcher_qualified():
            return [None] * len(chunks)
    import jax.numpy as jnp

    from . import zstd_dfast_pallas as dk

    sizes = [len(c) for c in chunks]
    if not chunks or max(sizes) > dk.MAX_IN:
        return [None] * len(chunks)
    cap = max(max(sizes), LANES)
    cap += (-cap) % LANES
    buf = np.zeros((len(chunks), cap), np.uint8)
    for i, c in enumerate(chunks):
        buf[i, : len(c)] = np.frombuffer(c, np.uint8)
    ll_a, ml_a, of_a, nseq_a, last_a, ok_a = dk.find_sequences_batch(
        jnp.asarray(buf), jnp.asarray(np.asarray(sizes, np.int32)))
    ll_n, ml_n, of_n = np.asarray(ll_a), np.asarray(ml_a), np.asarray(of_a)
    nseq_n, last_n, ok_n = (np.asarray(nseq_a), np.asarray(last_a),
                            np.asarray(ok_a))
    outs = []
    for i, c in enumerate(chunks):
        m = int(nseq_n[i])
        if not bool(ok_n[i]) or m == 0:
            outs.append(None)
            continue
        ll = ll_n[i, :m].astype(np.int64)
        ml = ml_n[i, :m].astype(np.int64)
        of = of_n[i, :m].astype(np.int64)
        last = int(last_n[i])
        data = np.frombuffer(c, np.uint8)
        if not _verify_proposals(data, ll, ml, of, last, dk.MIN_MATCH):
            outs.append(None)
            continue
        lits = _extract_literals(data, ll, ml, last)
        outs.append((ll, of, ml, lits))
    return outs


def _plan_chunk(data: bytes, level: int, pre=None) -> _Plan:
    """Host side of one chunk: matcher, tables, mode decisions. ``pre``
    carries the device matcher's (ll, offsets, ml, literals), skipping the
    host matcher."""
    p = _Plan()
    p.data = np.frombuffer(data, np.uint8)
    n = p.data.size
    if n == 0 or n > LIT_CAP:
        p.reason = "size"
        return p
    if pre is not None:
        ll, offsets, ml, literals = pre
    else:
        ll, offsets, ml, literals = block_enc.find_sequences(
            p.data, _params(level, n))
    if ll.size == 0 or ll.size > S_CAP:
        p.reason = "nseq"
        return p
    if literals.size < 256:
        p.reason = "small-literals"
        return p
    counts = np.bincount(literals, minlength=256)
    if np.count_nonzero(counts) < 2 or np.all(literals == literals[0]):
        p.reason = "literal-shape"
        return p
    ct = huff_enc.build_ctable(counts)
    est = huff_enc.estimate_compressed_bits(counts, ct)
    if est // 8 + 16 >= literals.size:
        p.reason = "incompressible-literals"
        return p
    # wire offsets (repcodes): fresh frame, one block
    rep = list(C.REP_INIT)
    ofw = frame_enc._apply_repcodes(ll, offsets + 3, rep)
    llc = seq_enc.ll_code(ll.astype(np.int64))
    mlc = seq_enc.ml_code(ml.astype(np.int64))
    ofc = seq_enc.of_code(ofw.astype(np.int64))
    f_ll = seq_enc._select_field(llc, C.MAX_LL_SYMBOL, C.LL_TABLE_LOG_MAX,
                                 C.LL_DEFAULT_NORM, C.LL_DEFAULT_LOG)
    f_of = seq_enc._select_field(ofc, C.MAX_OF_SYMBOL, C.OF_TABLE_LOG_MAX,
                                 C.OF_DEFAULT_NORM, C.OF_DEFAULT_LOG)
    f_ml = seq_enc._select_field(mlc, C.MAX_ML_SYMBOL, C.ML_TABLE_LOG_MAX,
                                 C.ML_DEFAULT_NORM, C.ML_DEFAULT_LOG)
    p.ll, p.ofw, p.ml, p.literals = ll, ofw, ml, literals
    p.ct, p.fields = ct, (f_ll, f_of, f_ml)
    p.device = True
    return p


def _pack_field(ct) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    dnb = np.zeros(SYM_CAP, np.int32)
    dfs = np.zeros(SYM_CAP, np.int32)
    ns = np.zeros(NS_CAP, np.int32)
    k = min(ct.delta_nb_bits.size, SYM_CAP)
    dnb[:k] = ct.delta_nb_bits[:k]
    dfs[:k] = ct.delta_find_state[:k]
    k = min(ct.next_state.size, NS_CAP)
    ns[:k] = ct.next_state[:k]
    return dnb, dfs, ns


def _assemble(p: _Plan, lit_by, lit_tot, seq_by, seq_tot) -> bytes:
    """Frame assembly from device stream bytes (host headers/tables)."""
    n = p.data.size
    literals, ct = p.literals, p.ct
    f_ll, f_of, f_ml = p.fields

    parts = []
    lens = []
    for s in range(4):
        nbytes = (int(lit_tot[s]) + 1 + 7) >> 3
        parts.append(lit_by[s, :nbytes].tobytes())
        lens.append(nbytes)
    table = huff_enc.write_table(ct)
    jump = b"".join(ln.to_bytes(2, "little") for ln in lens[:3])
    payload = jump + b"".join(parts)
    comp = len(table) + len(payload)
    regen = literals.size
    if any(ln > 0xFFFF for ln in lens[:3]):
        return b""
    if regen < 1 << 10 and comp < 1 << 10:
        header_len, size_format = 3, 1
    elif regen < 1 << 14 and comp < 1 << 14:
        header_len, size_format = 4, 2
    elif regen < 1 << 18 and comp < 1 << 18:
        header_len, size_format = 5, 3
    else:
        return b""
    raw_len = regen + (1 if regen <= 31 else 2 if regen <= 4095 else 3)
    if header_len + comp >= raw_len:
        return b""
    hdr = bytearray()
    b0 = C.COMPRESSED_LITERALS | (size_format << 2) | ((regen & 0xF) << 4)
    if header_len == 3:
        hdr += bytes([b0, ((regen >> 4) & 0x3F) | ((comp & 3) << 6),
                      comp >> 2])
    elif header_len == 4:
        hdr += bytes([b0, (regen >> 4) & 0xFF,
                      ((regen >> 12) & 3) | ((comp & 0x3F) << 2), comp >> 6])
    else:
        hdr += bytes([b0, (regen >> 4) & 0xFF,
                      ((regen >> 12) & 0x3F) | ((comp & 3) << 6),
                      (comp >> 2) & 0xFF, comp >> 10])
    lit_sec = bytes(hdr) + table + payload

    seq_hdr = bytearray()
    seq_enc._write_count_header(seq_hdr, int(p.ll.size))
    seq_hdr.append((f_ll.mode << 6) | (f_of.mode << 4) | (f_ml.mode << 2))
    for f in (f_ll, f_of, f_ml):
        seq_hdr += f.desc
    nbytes = (int(seq_tot) + 1 + 7) >> 3
    seq_sec = bytes(seq_hdr) + seq_by[:nbytes].tobytes()

    body = lit_sec + seq_sec
    if len(body) >= n:  # min-gain raw fallback
        return b""
    out = bytearray()
    out += int(frame_enc.MAGIC).to_bytes(4, "little")
    frame_enc._write_frame_header(out, n)
    out += frame_enc._block_header(1, C.COMPRESSED_BLOCK, len(body))
    out += body
    from ..xxhash import xxh64 as _xxh64

    out += int(_xxh64(p.data.tobytes()) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


def compress_batch(chunks, level: int = 3) -> list[bytes]:
    """Compress chunks (<=64KB each) as single-block zstd frames, entropy
    emission on device. Chunks outside the device envelope use the host
    tier (same output contract)."""
    import jax.numpy as jnp

    pres = _device_matcher_batch(chunks, level)
    plans = [_plan_chunk(c, level, pre)
             for c, pre in zip(chunks, pres)]
    outs: list = [None] * len(chunks)
    idxs = [i for i, p in enumerate(plans) if p.device]
    for lo in range(0, len(idxs), B_PER_LAUNCH):
        batch = idxs[lo : lo + B_PER_LAUNCH]
        B = B_PER_LAUNCH
        lit = np.zeros((B, LIT_CAP), np.int32)
        lit_seg = np.zeros((B, 4, 2), np.int32)
        hcodes = np.zeros((B, 256), np.int32)
        hbits = np.zeros((B, 256), np.int32)
        seqf = {k: np.zeros((B, S_CAP), np.int32)
                for k in ("llc", "mlc", "ofc", "llx", "mlx", "ofx",
                          "llxb", "mlxb", "ofxb")}
        nseq = np.zeros(B, np.int32)
        ftabs = {k: np.zeros((B, SYM_CAP), np.int32)
                 for k in ("ll_dnb", "ll_dfs", "ml_dnb", "ml_dfs",
                           "of_dnb", "of_dfs")}
        ntabs = {k: np.zeros((B, NS_CAP), np.int32)
                 for k in ("ll_ns", "ml_ns", "of_ns")}
        flush_bits = np.zeros((B, 3), np.int32)
        for r, i in enumerate(batch):
            p = plans[i]
            lits = p.literals
            lit[r, : lits.size] = lits
            seg = (lits.size + 3) // 4
            for s in range(4):
                st = s * seg
                lit_seg[r, s] = (st, max(0, min(seg, lits.size - st)))
            hcodes[r] = p.ct.codes
            hbits[r] = p.ct.nbits
            m = p.ll.size
            nseq[r] = m
            llc = seq_enc.ll_code(p.ll.astype(np.int64))
            mlc = seq_enc.ml_code(p.ml.astype(np.int64))
            ofc = seq_enc.of_code(p.ofw.astype(np.int64))
            seqf["llc"][r, :m] = llc
            seqf["mlc"][r, :m] = mlc
            seqf["ofc"][r, :m] = ofc
            seqf["llx"][r, :m] = p.ll - C.LL_BASE[llc]
            seqf["llxb"][r, :m] = C.LL_BITS[llc]
            seqf["mlx"][r, :m] = p.ml - C.ML_BASE[mlc]
            seqf["mlxb"][r, :m] = C.ML_BITS[mlc]
            seqf["ofx"][r, :m] = p.ofw - (np.int64(1) << ofc)
            seqf["ofxb"][r, :m] = ofc
            f_ll, f_of, f_ml = p.fields
            for pre, f in (("ll", f_ll), ("ml", f_ml), ("of", f_of)):
                dnb, dfs, ns = _pack_field(f.ctable)
                ftabs[f"{pre}_dnb"][r] = dnb
                ftabs[f"{pre}_dfs"][r] = dfs
                ntabs[f"{pre}_ns"][r] = ns
            flush_bits[r] = (f_ml.ctable.table_log, f_of.ctable.table_log,
                             f_ll.ctable.table_log)
        lit_by, lit_tot, seq_by, seq_tot = _emit()(
            jnp.asarray(lit), jnp.asarray(lit_seg), jnp.asarray(hcodes),
            jnp.asarray(hbits), jnp.asarray(seqf["llc"]),
            jnp.asarray(seqf["mlc"]), jnp.asarray(seqf["ofc"]),
            jnp.asarray(seqf["llx"]), jnp.asarray(seqf["mlx"]),
            jnp.asarray(seqf["ofx"]), jnp.asarray(seqf["llxb"]),
            jnp.asarray(seqf["mlxb"]), jnp.asarray(seqf["ofxb"]),
            jnp.asarray(nseq), jnp.asarray(ftabs["ll_dnb"]),
            jnp.asarray(ftabs["ll_dfs"]), jnp.asarray(ntabs["ll_ns"]),
            jnp.asarray(ftabs["ml_dnb"]), jnp.asarray(ftabs["ml_dfs"]),
            jnp.asarray(ntabs["ml_ns"]), jnp.asarray(ftabs["of_dnb"]),
            jnp.asarray(ftabs["of_dfs"]), jnp.asarray(ntabs["of_ns"]),
            jnp.asarray(flush_bits))
        lit_by = np.asarray(lit_by)
        lit_tot = np.asarray(lit_tot)
        seq_by = np.asarray(seq_by)
        seq_tot = np.asarray(seq_tot)
        for r, i in enumerate(batch):
            frame = _assemble(plans[i], lit_by[r], lit_tot[r],
                              seq_by[r], int(seq_tot[r]))
            if frame:
                outs[i] = frame
    for i, p in enumerate(plans):
        if outs[i] is None:
            outs[i] = frame_enc.compress_bytes(bytes(chunks[i]), level)
    return outs
