"""Host simulation of snappy_pallas_w's per-chunk step scheduling.

Parses each compressed blob's token stream and replays the kernel's body
rules (K steps/body; parse+emit same step; emit capped at row end; row
crossing or header-window stall closes the chunk for the rest of the body)
to find where production bodies go vs the ideal token count.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from aircompressor_tpu.snappy import SnappyCompressor

K = 8
TESTDATA = "/root/reference/testdata"
CHUNK = 65536
COMP_CAP = 40960


def tokens_of(blob):
    """Yield (kind, tok_size, length, dist) per token; kind 0=lit 1=copy."""
    n = blob[0] & 0x7F
    i = 1
    shift = 7
    while blob[i - 1] >= 128:
        n |= (blob[i] & 0x7F) << shift
        shift += 7
        i += 1
    toks = []
    while i < len(blob):
        tag = blob[i]
        t = tag & 3
        if t == 0:
            nn = tag >> 2
            extra = max(0, nn - 59)
            if extra:
                ln = int.from_bytes(blob[i + 1:i + 1 + extra], "little") + 1
            else:
                ln = nn + 1
            toks.append((0, 1 + extra + ln, ln, 0))
            i += 1 + extra + ln
        elif t == 1:
            ln = 4 + ((tag >> 2) & 7)
            d = ((tag >> 5) << 8) | blob[i + 1]
            toks.append((1, 2, ln, d))
            i += 2
        elif t == 2:
            ln = (tag >> 2) + 1
            d = blob[i + 1] | (blob[i + 2] << 8)
            toks.append((1, 3, ln, d))
            i += 3
        else:
            ln = (tag >> 2) + 1
            d = int.from_bytes(blob[i + 1:i + 4], "little")
            toks.append((1, 5, ln, d))
            i += 5
    return n, toks


def simulate(blob):
    """Replay the kernel's body/step rules for one chunk. Returns
    (bodies, steps_used, idle_steps, tokens)."""
    declared, toks = tokens_of(blob)
    # reconstruct ip positions: ip = position of tag byte
    n = blob[0] & 0x7F
    vlen = 1
    while blob[vlen - 1] >= 128:
        vlen += 1
    ip = vlen
    op = 0
    rem = 0
    dist = 0
    ti = 0
    tok_ip = []
    p = vlen
    for kind, tsz, ln, d in toks:
        tok_ip.append(p)
        p += tsz
    bodies = 0
    steps = 0
    idle = 0
    state_rem = 0
    state_dist = 0
    state_kind = 0
    while ti < len(toks) or state_rem > 0:
        bodies += 1
        # body start: header window from current ip
        if ti < len(toks):
            hbase = (tok_ip[ti] >> 7) << 7
        else:
            hbase = 0
        open_ = True
        for k in range(K):
            if not open_:
                idle += 1
                continue
            steps += 1
            if state_rem == 0:
                if ti >= len(toks):
                    open_ = False
                    continue
                ipos = tok_ip[ti]
                if ipos + 5 > hbase + 256:
                    open_ = False  # stall
                    idle += 1
                    steps -= 1
                    continue
                kind, tsz, ln, d = toks[ti]
                ti += 1
                state_rem = ln
                state_dist = d if kind else 1 << 30
                state_kind = kind
            o = op & 127
            take = min(state_rem, 128 - o)
            if state_kind == 1:
                take = min(take, state_dist)
            op += take
            state_rem -= take
            if state_kind == 1 and take == state_dist and state_rem > 0:
                state_dist *= 2
            if (op & 127) == 0 and take > 0:
                open_ = False  # crossing
    return bodies, steps, idle, len(toks), declared


def main():
    names = ["urls.10K", "html", "geo.protodata", "kppkn.gtb", "house.jpg",
             "mapreduce-osdi-1.pdf", "large/bible.txt", "large/world192.txt"]
    blobs, raws = [], []
    comp = SnappyCompressor.create()
    data = b"".join(open(os.path.join(TESTDATA, n), "rb").read()
                    for n in names if os.path.exists(os.path.join(TESTDATA, n)))
    data = (data * ((16 << 20) // len(data) + 1))[: 16 << 20]
    for lo in range(0, len(data), CHUNK):
        c = data[lo:lo + CHUNK]
        if len(c) < CHUNK:
            break
        b = comp.compress(c)
        if len(b) <= COMP_CAP:
            blobs.append(b)
            raws.append(c)
        if len(blobs) == 256:
            break
    blobs.sort(key=len)
    rows = [simulate(b) for b in blobs]
    bodies = np.array([r[0] for r in rows])
    steps = np.array([r[1] for r in rows])
    idle = np.array([r[2] for r in rows])
    toks = np.array([r[3] for r in rows])
    print(f"chunks={len(blobs)}")
    print(f"tokens/chunk: mean={toks.mean():.0f} p50={np.median(toks):.0f} "
          f"max={toks.max()}")
    print(f"bytes/token: {65536/toks.mean():.2f}")
    print(f"bodies/chunk: mean={bodies.mean():.0f} p50={np.median(bodies):.0f} "
          f"max={bodies.max()}")
    print(f"steps used: {steps.mean():.0f}  idle in open bodies: {idle.mean():.0f}")
    print(f"steps/token: {steps.sum()/toks.sum():.2f}")
    # lockstep barrier: grid groups of 64 (sorted); cost = 64*max(bodies)
    for SUB in (64,):
        tot_ideal = bodies.sum()
        tot_barrier = 0
        for g in range(0, len(blobs), SUB):
            grp = bodies[g:g + SUB]
            tot_barrier += grp.max() * len(grp)
        print(f"SUB={SUB}: sum bodies={tot_ideal}  barrier bodies={tot_barrier} "
              f"(x{tot_barrier/tot_ideal:.2f})")
        # perfect-efficiency reference: tokens/K per chunk
        tot_min = int(np.ceil(toks / K).sum())
        print(f"  min possible bodies (tokens/K): {tot_min} "
              f"(sched x{tot_ideal/tot_min:.2f}, total x{tot_barrier/tot_min:.2f})")


if __name__ == "__main__":
    main()
