"""TPU compute tier — JAX/XLA/Pallas kernels.

This package is the analogue of the reference's native tier (reference:
internal/NativeLoader.java + *Native bindings): the fast path behind the same
public codec interfaces, selected by ``create()`` factories when a TPU (or any
JAX backend) is available.

Design rules (TPU-first, see SURVEY.md §7):
- every kernel is batched over independent chunks (the formats' own restart
  boundaries: Snappy 64KB blocks, LZ4-frame 4MB blocks, zstd 128KB blocks);
- variable-length data is (padded buffer, lengths) pairs, compaction by
  prefix sums;
- no data-dependent Python control flow: ``lax.scan`` / masks / fixed trip
  counts;
- 64-bit integer math is explicit (hi, lo) u32 pairs (ops/u64.py) — TPUs have
  no native u64, this is what XLA would emulate anyway, stated explicitly.
"""
