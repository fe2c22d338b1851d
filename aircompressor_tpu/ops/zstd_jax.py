"""Zstd batch decode on device — host planner + three Pallas launches.

Pipeline per launch (reference architecture contrast: the reference decodes
a frame on one thread end-to-end, zstd/ZstdFrameDecompressor.java:135-210;
here the entropy payloads of a whole BATCH decode in three single-launch
device kernels and the host touches only headers):

  zstd/device_prep.plan_batch      (host: frame/block/table headers)
  -> zstd_pallas.huffman_decode    (kernel A: all Huffman literal streams)
  -> zstd_pallas.fse_sequences     (kernel C: all FSE sequences sections)
  -> zstd_pallas.execute           (kernel D: one grid step per frame)

Launch geometry is FIXED (shapes below) so jit compiles one program per
kernel; a batch is split greedily into launches that fit the geometry, and
frames that cannot fit (pathological block/stream counts, oversize frames)
fall back to the host tier — the same graceful-degradation contract as the
reference's native->java fallback (internal/NativeLoader.java:104-112).

VMEM budget (v5e ~16MB/core): src 2.2MB + litpad 2.2MB + seq 3x0.7MB +
out-block 0.25MB + tables << 16MB for the default geometry.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..errors import MalformedInputException
from ..zstd import constants as C
from ..zstd import device_prep as dp
from .zstd_pallas import EXEC_G, EXEC_SUB, HUFF_AG, HUFF_SUB, SEQ_SUB

LANES = 128

# ------------------------------------------------------- fixed launch geometry
# VMEM is ~128MB on v5e; the kernel-D working set (src + litpad + 3 seq arrays
# + one out block, all i32) is the binding sum (~26MB at this geometry).
F_PER_LAUNCH = 32  # frames per launch
OUT_CAP = 65536  # per-frame decompressed capacity (the snappy-chunk bound)
SRC_ROWS = 16896  # 2,162,688 input bytes (>= F * maxCompressedLength(OUT_CAP))
LIT_ROWS = 16896  # 2,162,688 padded literal slots
SEQ_ROWS = 5632  # 720,896 sequence slots
GH = 256 // HUFF_SUB  # Huffman stream groups (256 streams total)
GS = 64 // SEQ_SUB  # sequences-section groups (64 streams total)
DESC_ROWS = 256  # block descriptors


def _seq_info() -> np.ndarray:
    """(8,128) constant rows: [0]=LL base<<5|xbits, [1]=ML base<<5|xbits."""
    info = np.zeros((8, LANES), np.int32)
    nll = C.LL_BASE.size
    info[0, :nll] = (C.LL_BASE.astype(np.int64) << 5 | C.LL_BITS).astype(np.int32)
    nml = C.ML_BASE.size
    info[1, :nml] = (C.ML_BASE.astype(np.int64) << 5 | C.ML_BITS).astype(np.int32)
    return info


_SEQ_INFO = _seq_info()


def _usage(plan: dp.BatchPlan) -> tuple:
    """(src bytes 128-aligned, lit slots, seq slots, huff streams, seq
    streams, blocks, frames) — the launch-geometry resource vector."""
    return (
        dp._align(plan.src.size),
        plan.litpad_size,
        plan.seq_size,
        len(plan.huff_streams),
        len(plan.seq_streams),
        sum(len(f.blocks) for f in plan.frames),
        len(plan.frames),
    )


# src capped one ROW below the buffer and descriptors one SLOT below:
# the kernels fetch (row, row+1) pairs via single 2-row slices clamped to
# cap-2, which would silently mis-address a source living in the very
# last row — keep that row unreachable instead
_LIMITS = ((SRC_ROWS - 1) * LANES - 8, LIT_ROWS * LANES, SEQ_ROWS * LANES,
           GH * HUFF_SUB, GS * SEQ_SUB, DESC_ROWS - 1, F_PER_LAUNCH)


def _fits(usage: tuple) -> bool:
    return all(u <= lim for u, lim in zip(usage, _LIMITS))


def _merge_plans(plans: list) -> dp.BatchPlan:
    """Concatenate per-item solo plans into one launch plan by offset
    rebasing (each item's src segment is 128-aligned in the merged buffer;
    litpad/seq slots are already 128-aligned per stream)."""
    total_src = sum(dp._align(p.src.size) for p in plans)
    src = np.zeros(max(dp._align(total_src), LANES), np.uint8)
    merged = dp.BatchPlan(src=src, out_cap=plans[0].out_cap)
    src_base = lit_base = seq_base = 0
    for p in plans:
        src[src_base : src_base + p.src.size] = p.src
        for hs in p.huff_streams:
            merged.huff_streams.append(dataclasses.replace(
                hs, byte_lo=hs.byte_lo + src_base,
                out_base=hs.out_base + lit_base))
        for ss in p.seq_streams:
            merged.seq_streams.append(dataclasses.replace(
                ss, byte_lo=ss.byte_lo + src_base,
                out_base=ss.out_base + seq_base))
        for fp in p.frames:
            blocks = []
            for bp in fp.blocks:
                kinds, srcs, ends = list(bp.piece_kind), list(bp.piece_src), list(bp.piece_end)
                for k, kind in enumerate(kinds):
                    if kind == dp.PIECE_RAW:
                        srcs[k] += src_base
                    elif kind == dp.PIECE_HUFF:
                        srcs[k] += lit_base
                blocks.append(dp.BlockPlan(
                    bp.n_seq,
                    bp.seq_out_base + seq_base if bp.seq_out_base >= 0 else -1,
                    bp.lit_total, kinds, srcs, ends))
            merged.frames.append(dataclasses.replace(fp, blocks=blocks))
        src_base += dp._align(p.src.size)
        lit_base += p.litpad_size
        seq_base += p.seq_size
    merged.litpad_size = max(lit_base, LANES)
    merged.seq_size = max(seq_base, LANES)
    return merged


def _pack_huff(plan: dp.BatchPlan):
    # HUFF_AG groups interleave per grid step; the grid-step iteration
    # bound is the max over its AG*SUB streams (sorted packing keeps them
    # similar)
    iters = np.zeros(GH // HUFF_AG, np.int32)
    params = np.zeros((GH * HUFF_SUB, 384), np.int32)
    # long streams first so group iteration bounds track the real work
    order = sorted(range(len(plan.huff_streams)),
                   key=lambda i: -plan.huff_streams[i].nsym)
    for slot, i in enumerate(order):
        hs = plan.huff_streams[i]
        g = slot // (HUFF_SUB * HUFF_AG)
        row = params[slot]
        row[0] = hs.byte_lo * 8  # A_BITBASE (bits)
        row[1] = hs.rem_init
        row[2] = hs.nsym
        row[3] = hs.out_base // LANES  # A_OUTROW
        row[4] = hs.table_log
        row[8:20] = hs.rank_start[1:13]  # A_RS
        row[24:36] = hs.cum_syms  # A_CUM
        row[128:384] = hs.perm
        iters[g] = max(iters[g], hs.nsym)
    return iters, params


def _pack_seq(plan: dp.BatchPlan):
    iters = np.zeros(GS, np.int32)
    params = np.zeros((GS * SEQ_SUB, 128), np.int32)
    tabs = np.zeros((GS, 10, SEQ_SUB, 128), np.int32)
    order = sorted(range(len(plan.seq_streams)),
                   key=lambda i: -plan.seq_streams[i].nseq)
    for slot, i in enumerate(order):
        ss = plan.seq_streams[i]
        g, r = slot // SEQ_SUB, slot % SEQ_SUB
        row = params[slot]
        row[0] = ss.byte_lo * 8  # C_BITBASE (bits)
        row[1] = ss.rem_init
        row[2] = ss.nseq
        row[3] = ss.out_base // LANES  # C_OUTROW
        row[4] = ss.ll_state
        row[5] = ss.of_state
        row[6] = ss.ml_state
        tabs[g, 0:4, r] = ss.ll_entries.reshape(4, 128)
        tabs[g, 4:6, r] = ss.of_entries.reshape(2, 128)
        tabs[g, 6:10, r] = ss.ml_entries.reshape(4, 128)
        iters[g] = max(iters[g], ss.nseq)
    return iters, params, tabs


def _pack_frames(plan: dp.BatchPlan):
    frames = np.zeros((F_PER_LAUNCH, LANES), np.int32)
    desc = np.zeros((DESC_ROWS, LANES), np.int32)
    iters = np.zeros(F_PER_LAUNCH // (EXEC_G * EXEC_SUB), np.int32)
    di = 0
    for f, fp in enumerate(plan.frames):
        frames[f, 0] = di  # F_DESCBASE
        frames[f, 1] = len(fp.blocks)  # F_NBLOCKS
        bound = 64
        for bp in fp.blocks:
            row = desc[di]
            row[0] = bp.n_seq  # D_NSEQ
            row[1] = max(bp.seq_out_base, 0) // LANES  # D_SEQROW
            row[2] = bp.lit_total  # D_LITTOTAL
            for k in range(len(bp.piece_kind)):
                row[4 + k] = bp.piece_kind[k]  # D_PKIND
                # raw pieces read the input half of the litsrc buffer
                row[8 + k] = bp.piece_src[k] + (
                    LIT_ROWS * LANES if bp.piece_kind[k] == dp.PIECE_RAW else 0)
                row[12 + k] = bp.piece_end[k]  # D_PEND
            di += 1
            # runaway guard: every kernel-D iteration either emits >=1 byte
            # or transitions a run (<= 2 per sequence) or a block
            bound += bp.lit_total + 4 * bp.n_seq + 8
        frames[f, 2] = bound + OUT_CAP  # F_ITERS (per-frame bound)
    # iters is only the mandatory scalar-prefetch operand; the kernel reads
    # the real per-frame bounds from frames lane F_ITERS and ignores this
    return iters, frames, desc


def _pad_src(src: np.ndarray):
    """Flat u8, zero-padded to the launch geometry (device derives the i32
    byte rows and LE words — uploading u8 once instead of i32 twice cuts
    host->device bytes 5x, the binding cost on a slow interconnect)."""
    buf = np.zeros(SRC_ROWS * LANES, np.uint8)
    buf[: src.size] = src
    return buf


_META_PACK = None


def _pack_meta(out_len, ok, h_rem, s_rem, s_err):
    global _META_PACK
    if _META_PACK is None:
        import jax
        import jax.numpy as jnp

        def pack(out_len, ok, h_rem, s_rem, s_err):
            return jnp.concatenate([
                out_len.astype(jnp.int32), ok.astype(jnp.int32),
                h_rem.astype(jnp.int32), s_rem.astype(jnp.int32),
                s_err.astype(jnp.int32)])

        _META_PACK = jax.jit(pack)
    return _META_PACK(out_len, ok, h_rem, s_rem, s_err)


_EXEC_PREP = None


def _exec_inputs(ll, ml, of, litpad, src_rows):
    """Kernel-D input packing, on device: row-interleave the (ll,ml,of)
    triples (one 3-row slice per seq cursor in the kernel) and concatenate
    huffman literals + raw input into one litsrc buffer (PIECE_RAW sources
    carry the LIT_ROWS*128 offset, baked by _pack_frames)."""
    global _EXEC_PREP
    if _EXEC_PREP is None:
        import jax
        import jax.numpy as jnp

        def prep(ll, ml, of, litpad, src_rows):
            seq3 = jnp.stack([ll, ml, of], axis=1).reshape(-1, LANES)
            litsrc = jnp.concatenate([litpad, src_rows], axis=0)
            return seq3, litsrc

        _EXEC_PREP = jax.jit(prep)
    return _EXEC_PREP(ll, ml, of, litpad, src_rows)


_SRC_PREP = None


def _src_views(src_u8):
    """(SRC_ROWS,128) i32 byte rows + (SRC_ROWS//4,128) i32 LE words, on
    device, from the flat u8 upload (module-level jit: defining the jitted
    fn per call would recompile every launch)."""
    global _SRC_PREP
    if _SRC_PREP is None:
        import jax
        import jax.numpy as jnp

        def prep(u8):
            b = u8.astype(jnp.int32)
            rows = b.reshape(SRC_ROWS, LANES)
            q = b.reshape(-1, 4)
            words = (q[:, 0] | (q[:, 1] << 8) | (q[:, 2] << 16)
                     | (q[:, 3] << 24))
            return rows, words.reshape(SRC_ROWS // 4, LANES)

        _SRC_PREP = jax.jit(prep)
    return _SRC_PREP(src_u8)


_PIPE = {}


def _pipe_fn(desc_rows: int, interpret: bool):
    """ONE fused program for a whole launch (r4): every dispatch through
    the dev relay costs ~25ms regardless of size, so the three kernels,
    the src/exec input prep, and the meta pack run as a single jit fed by
    TWO uploads (src u8 + one packed i32 params blob). r3 ran ~10
    dispatches per launch; the fused program cuts the per-launch relay
    cost ~3x."""
    key = (desc_rows, interpret)
    if key not in _PIPE:
        import jax
        import jax.numpy as jnp

        from . import zstd_pallas

        shapes = (
            (GH // HUFF_AG,), (GH * HUFF_SUB, 384),
            (GS,), (GS * SEQ_SUB, 128), (GS, 10, SEQ_SUB, 128),
            (F_PER_LAUNCH // (zstd_pallas.EXEC_G * EXEC_SUB),),
            (F_PER_LAUNCH, LANES), (desc_rows, LANES),
        )
        info_const = np.asarray(_SEQ_INFO)

        def pipe(src_u8, blob):
            b = src_u8.astype(jnp.int32)
            src_rows = b.reshape(SRC_ROWS, LANES)
            q = b.reshape(-1, 4)
            src_words = (q[:, 0] | (q[:, 1] << 8) | (q[:, 2] << 16)
                         | (q[:, 3] << 24)).reshape(SRC_ROWS // 4, LANES)
            cuts, o = [], 0
            for sh in shapes:
                n = int(np.prod(sh))
                cuts.append(blob[o : o + n].reshape(sh))
                o += n
            (h_iters, h_params, s_iters, s_params, s_tabs,
             d_iters, d_frames, d_desc) = cuts
            litpad, h_rem = zstd_pallas.huffman_decode(
                h_iters, h_params, src_rows, LIT_ROWS, interpret)
            ll, ml, of, s_rem, s_err = zstd_pallas.fse_sequences(
                s_iters, s_params, s_tabs, jnp.asarray(info_const),
                src_words, SEQ_ROWS, interpret)
            seq3 = jnp.stack([ll, ml, of], axis=1).reshape(-1, LANES)
            litsrc = jnp.concatenate([litpad, src_rows], axis=0)
            out, out_len, ok = zstd_pallas.execute(
                d_iters, d_frames, d_desc, seq3, litsrc,
                OUT_CAP // LANES, interpret)
            meta = jnp.concatenate([
                out_len.astype(jnp.int32), ok.astype(jnp.int32),
                h_rem.astype(jnp.int32), s_rem.astype(jnp.int32),
                s_err.astype(jnp.int32)])
            return out, meta

        _PIPE[key] = jax.jit(pipe)
    return _PIPE[key]


def _pack_launch(plan: dp.BatchPlan):
    """(src u8 flat, params blob i32 flat) for one launch — fixed shapes."""
    h_iters, h_params = _pack_huff(plan)
    s_iters, s_params, s_tabs = _pack_seq(plan)
    d_iters, d_frames, d_desc = _pack_frames(plan)
    blob = np.concatenate([
        a.ravel() for a in (h_iters, h_params, s_iters, s_params, s_tabs,
                            d_iters, d_frames, d_desc)]).astype(np.int32)
    return _pad_src(plan.src), blob


def _enqueue_plan(plan: dp.BatchPlan):
    """Enqueue ONE fused program for one planned launch; returns device
    handles (no sync)."""
    import jax
    import jax.numpy as jnp

    interpret = jax.default_backend() != "tpu"
    src, blob = _pack_launch(plan)
    pipe = _pipe_fn(DESC_ROWS, interpret)
    out, meta = pipe(jnp.asarray(src), jnp.asarray(blob))
    return (out, meta, F_PER_LAUNCH, GH * HUFF_SUB, GS * SEQ_SUB)


def _finalize_plan(plan: dp.BatchPlan, handles):
    """Fetch + validate one enqueued launch; returns (out_bytes(F,cap) u8,
    out_lens(F,), ok(F,))."""
    out, meta, nf, nh, ns = handles
    n = len(plan.frames)
    from .zstd_pallas import OUT_PAD_ROWS
    rows_p = OUT_CAP // LANES + OUT_PAD_ROWS
    out_n = np.asarray(out).reshape(
        F_PER_LAUNCH, rows_p * LANES)[:n, :OUT_CAP]
    meta_n = np.asarray(meta)
    out_len_n = meta_n[:nf][:n]
    ok_n = (meta_n[nf : 2 * nf][:n] > 0).copy()
    # entropy-stream validation: a fully-consumed backward stream ends rem==0
    h_rem_n = meta_n[2 * nf : 2 * nf + nh]
    s_rem_n = meta_n[2 * nf + nh : 2 * nf + nh + ns]
    s_err_n = meta_n[2 * nf + nh + ns : 2 * nf + nh + 2 * ns]
    order = sorted(range(len(plan.huff_streams)),
                   key=lambda i: -plan.huff_streams[i].nsym)
    bad_lit = {plan.huff_streams[i].out_base
               for slot, i in enumerate(order) if h_rem_n[slot] != 0}
    order = sorted(range(len(plan.seq_streams)),
                   key=lambda i: -plan.seq_streams[i].nseq)
    bad_seq = {plan.seq_streams[i].out_base
               for slot, i in enumerate(order)
               if s_rem_n[slot] != 0 or s_err_n[slot]}
    for f, fp in enumerate(plan.frames):
        for bp in fp.blocks:
            if bp.seq_out_base >= 0 and bp.seq_out_base in bad_seq:
                ok_n[f] = False
            for kind, sbase in zip(bp.piece_kind, bp.piece_src):
                if kind == dp.PIECE_HUFF and sbase in bad_lit:
                    ok_n[f] = False
        if fp.content_size >= 0 and out_len_n[f] != fp.content_size:
            ok_n[f] = False
    return out_n, out_len_n, ok_n


def _host_decode_one(item: bytes, out_cap: int) -> bytes:
    """Host-tier fallback for frames the launch geometry cannot hold."""
    from ..zstd import frame_dec

    src = np.frombuffer(bytes(item), np.uint8)
    dst = np.zeros(out_cap, np.uint8)
    n = frame_dec.decompress(src, dst)
    return dst[:n].tobytes()


_SELF_CHECK: list = []  # [] = not run; [True/False] = device tier usable


def _device_self_check() -> bool:
    """One-time canary: decode a known frame on device before trusting the
    kernels this process (same graceful-fallback contract as the native
    loader, internal/NativeLoader.java:104-112 — a backend/lowering
    regression degrades to the host tier instead of corrupting output)."""
    if not _SELF_CHECK:
        try:
            from ..zstd import frame_enc

            payload = (b"the quick brown fox " * 40)[:777]
            frame = bytes(frame_enc.compress_bytes(payload))
            plan = dp.plan_batch([frame], OUT_CAP)
            out_n, out_len_n, ok_n = _finalize_plan(plan, _enqueue_plan(plan))
            good = bool(ok_n[0]) and out_n[0, : out_len_n[0]].tobytes() == payload
        except Exception:  # noqa: BLE001
            good = False
        _SELF_CHECK.append(good)
    return _SELF_CHECK[0]


def decode_batch(items, out_cap: int = OUT_CAP, verify_checksums: bool = True):
    """Decode a batch of single-frame zstd payloads on the device.

    Returns list[bytes]. Raises MalformedInputException (with the item index
    as offset) on any malformed frame. Frames that exceed the launch geometry
    decode on the host tier (same output, graceful degradation)."""
    if out_cap > OUT_CAP:
        raise ValueError(f"device zstd tier caps frames at {OUT_CAP} bytes")
    if not _device_self_check():
        outs_h: list = []
        for i, item in enumerate(items):
            try:
                outs_h.append(_host_decode_one(item, out_cap))
            except MalformedInputException as e:
                raise MalformedInputException(i, e.reason) from e
        return outs_h
    outs: list = [None] * len(items)
    batch: list = []  # (item index, solo plan)
    usage = (0,) * len(_LIMITS)
    inflight: list = []  # (batch, merged plan, device handles)

    def enqueue():
        if not batch:
            return
        plan = _merge_plans([p for _, p in batch])
        inflight.append((list(batch), plan, _enqueue_plan(plan)))

    # phase 1: plan + enqueue every launch (per-launch uploads + ONE fused
    # dispatch each, so transfers overlap the previous launch's device
    # work on the ~30MB/s tunnel — a whole-batch upload was measured
    # SLOWER, it serializes transfer behind compute); phase 2: fetch +
    # validate in order
    for i, item in enumerate(items):
        solo = dp.plan_batch([item], out_cap)
        u = _usage(solo)
        if not _fits(u):
            outs[i] = _host_decode_one(item, out_cap)  # geometry overflow
            continue
        summed = tuple(a + b for a, b in zip(usage, u))
        if batch and not _fits(summed):
            enqueue()
            batch, usage, summed = [], (0,) * len(_LIMITS), u
        batch.append((i, solo))
        usage = summed
    enqueue()

    from ..xxhash import xxh64

    for lbatch, plan, handles in inflight:
        out_n, out_len_n, ok_n = _finalize_plan(plan, handles)
        bad = np.nonzero(~ok_n)[0]
        if bad.size:
            raise MalformedInputException(
                lbatch[int(bad[0])][0], "malformed zstd frame in device batch")
        for j, (i, _) in enumerate(lbatch):
            outs[i] = out_n[j, : out_len_n[j]].tobytes()
            if verify_checksums:
                fp = plan.frames[j]
                if fp.has_checksum and (xxh64(outs[i]) & 0xFFFFFFFF) != fp.checksum:
                    raise MalformedInputException(
                        i, "frame checksum mismatch (device decode)")
    return outs
