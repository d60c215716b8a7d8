"""Analytical performance/area/power models (asic_numbers.py analogue).

Two models:

1. **ASIC vault model** — the reference's analytical model of a GenASM-
   style accelerator (scripts/asic_numbers.py:75-295), reimplemented:
   per-window latency (2W+1 DC cycles per PE-block + W-O TB cycles),
   TB-SRAM sizing under the four SENE/DENT layouts, and area/power scaled
   linearly from the published 28nm GenASM numbers (64 PEs, 8 KiB DC-SRAM,
   96 KiB TB-SRAM per vault). Reproduces the headline 3.6x area / 2.1x
   power claims (asic_numbers.py:222-252). The optional CACTI integration
   (clone+build an external tool, :17-73) is intentionally not vendored;
   the linear-scaling model is the default there and here.

2. **TPU kernel model** — the roofline-style cost model for THIS
   framework's Pallas engine (the role plot.py:2338-2476 plays for
   A6000/Xeon): predicted aligns/s/chip from the VPU issue rate, the
   expected early-terminated row count, and the gather/transfer budget.

3. **Speed-of-light bound** (``sol`` mode) — a calibration-free v5e VPU
   port model of the kernel sections (instruction counts read off the
   kernel source x issue widths), the committed floor the measured
   kernel is reconciled against in PARITY.md.

CLI:
  python -m scrooge_tpu.profiling.model improvements
  python -m scrooge_tpu.profiling.model sweep [--out=asic_sweep.csv]
  python -m scrooge_tpu.profiling.model tpu [--W=64] [--error_rate=0.05]
  python -m scrooge_tpu.profiling.model sol [--batch=16384]
"""

from __future__ import annotations

import argparse
import csv
import math
import sys
from itertools import product

KIBI = 1024

# Published GenASM per-vault reference points (28nm, 1 GHz), the scaling
# anchors of the model (asic_numbers.py:162-220).
GENASM_PES = 64
GENASM_DC_SRAM = 8 * KIBI
GENASM_TB_SRAM = 96 * KIBI
GENASM_DC_LOGIC_AREA = 0.049  # mm^2
GENASM_TB_LOGIC_AREA = 0.016
GENASM_DC_SRAM_AREA = 0.013
GENASM_TB_SRAM_AREA = 0.256
GENASM_DC_LOGIC_POWER = 0.033  # W
GENASM_TB_LOGIC_POWER = 0.004
GENASM_DC_SRAM_POWER = 0.009
GENASM_TB_SRAM_POWER = 0.055


def single_window_latency(W: int, O: int, pes: int) -> int:
    """Cycles per window: DC = (2W+1) per block of <=PES chars, TB = W-O."""
    dc_cycles_per_block = 2 * W + 1
    blocks = math.ceil(W / pes)
    return dc_cycles_per_block * blocks + (W - O)


def sequence_latency(seq_len: int, W: int, O: int, pes: int) -> int:
    windows = math.ceil(seq_len / (W - O))
    return single_window_latency(W, O, pes) * windows


def vault_throughput(seq_len: int, W: int, O: int, pes: int,
                     frequency: float) -> float:
    return frequency / sequence_latency(seq_len, W, O, pes)


def dc_bytes(W: int) -> float:
    """DC-SRAM scales linearly with W from the 8 KiB @ W=64 anchor."""
    return GENASM_DC_SRAM / 64 * W


def tb_memory(W: int, O: int, sene: bool, dent: bool):
    """(columns, bits_per_column, bandwidth_per_column) of the TB SRAM for
    each storage layout (asic_numbers.py:111-136):
      neither: 3 edge bitvectors of W bits, W x W
      SENE:    1 entry bitvector of W bits, (W+1) x W
      DENT:    3 edge bitvectors of W-O bits, W x (W-O)
      both:    1 entry of min(W-O+1, W) bits, (W+1) x min(W-O+1, W)
    """
    if not sene and not dent:
        bits, per_entry, rows, cols = W, 3, W, W
    elif sene and not dent:
        bits, per_entry, rows, cols = W, 1, W + 1, W
    elif dent and not sene:
        bits, per_entry, rows, cols = W - O, 3, W, W - O
    else:
        bits, per_entry, rows, cols = min(W - O + 1, W), 1, W + 1, \
            min(W - O + 1, W)
    return cols, bits * per_entry * rows, bits * per_entry


def area(W: int, O: int, pes: int, sene: bool, dent: bool):
    """(dc_logic, tb_logic, dc_sram, tb_sram) mm^2 per vault."""
    dc_logic = pes * GENASM_DC_LOGIC_AREA / GENASM_PES
    dc_sram = dc_bytes(W) * GENASM_DC_SRAM_AREA / GENASM_DC_SRAM
    tb_logic = GENASM_TB_LOGIC_AREA + (
        GENASM_DC_LOGIC_AREA / GENASM_PES if sene else 0)
    cols, bits_per_col, _ = tb_memory(W, O, sene, dent)
    tb_bytes = math.ceil(cols * bits_per_col / 8)
    tb_sram = tb_bytes * GENASM_TB_SRAM_AREA / GENASM_TB_SRAM
    return dc_logic, tb_logic, dc_sram, tb_sram


def power(W: int, O: int, pes: int, sene: bool, dent: bool):
    """(dc_logic, tb_logic, dc_sram, tb_sram) W per vault."""
    dc_logic = pes * GENASM_DC_LOGIC_POWER / GENASM_PES
    dc_sram = dc_bytes(W) * GENASM_DC_SRAM_POWER / GENASM_DC_SRAM
    tb_logic = GENASM_TB_LOGIC_POWER + (
        GENASM_DC_LOGIC_POWER / GENASM_PES if sene else 0)
    cols, bits_per_col, _ = tb_memory(W, O, sene, dent)
    tb_bytes = math.ceil(cols * bits_per_col / 8)
    tb_sram = tb_bytes * GENASM_TB_SRAM_POWER / GENASM_TB_SRAM
    return dc_logic, tb_logic, dc_sram, tb_sram


def print_improvements(out=sys.stdout):
    """The Scrooge-vs-GenASM headline table (asic_numbers.py:222-252):
    SENE+DENT at W=64 O=33 vs neither."""
    def dump(tag, vals, unit):
        print(f"{tag}: {sum(vals):.3f}{unit}", file=out)
        for name, v in zip(("DC Logic", "TB Logic", "DC SRAM", "TB SRAM"),
                           vals):
            print(f" - {name}: {v:.3f}{unit}", file=out)

    ga = area(64, 33, 64, False, False)
    sa = area(64, 33, 64, True, True)
    dump("GenASM Area", ga, "mm^2")
    dump("Scrooge Area", sa, "mm^2")
    print(f"Area Improvement: {sum(ga) / sum(sa):.3f}x\n", file=out)

    gp = power(64, 33, 64, False, False)
    sp = power(64, 33, 64, True, True)
    dump("GenASM Power", gp, "W")
    dump("Scrooge Power", sp, "W")
    print(f"Power Improvement: {sum(gp) / sum(sp):.3f}x\n", file=out)


def sweep_rows(seq_len: int = 10_000, frequency: float = 1e9):
    """Config sweep rows (asic_numbers.py:254-295 schema)."""
    rows = []
    for W, O, sene, dent in product([64], range(0, 128), [False, True],
                                    [False, True]):
        if O >= W:
            continue
        a = area(W, O, 64, sene, dent)
        p = power(W, O, 64, sene, dent)
        tput = vault_throughput(seq_len, W, O, 64, frequency)
        rows.append([W, O, sene, dent, sum(a), sum(p), tput])
    return rows


# --- TPU kernel model (Pallas engine) -------------------------------
#
# Per-stage cost constants CALIBRATED against on-device measurements at
# the bench shape (16384-lane tile x 10 kbp reads, 95% accuracy, W=64
# K=64 O=33, sk=16 kw=8, TPU v5e, 2026-08-20 — the ROUND-5 engine:
# pair-packed RESULT rows, consumer-fused unpack):
#   - section costs from the doubled-section ablation, profile/ablation.csv
#     (pm 0.003s, fill 0.029s, tb 0.016s per 16384-lane batch)
#   - total from the kernel_rate sampling protocol (0.0659s/16384 =
#     248.8k aligns/s median of 3 groups, tools/r5_kernel_ab.py)
#   - the residual (entries HBM write + DUS accumulation + slab slices +
#     per-slab Mosaic launch) = total - sections = 0.018s.
# The bench-level "core" additionally pays one tunnel sync per tile
# (~40-90ms on this rig) — pipeline accounting outside this model.
# Constants are PER LANE (vector-op cost scales with the lanes a tile
# holds: an (8,128) tile op costs half a (16,128) one), calibrated at the
# sk=16 headline (2048 lanes/tile).
TPU_FILL_S = 17.2e-9 / 2048   # per fill step x bitvector word x lane
TPU_PM_S = 5.6e-9 / 2048      # per pattern char x lane (masks + unpack)
TPU_TB_S = 25.2e-9 / 2048     # per tb level x stored column x word x lane
# the three residual terms below are jointly calibrated to the measured
# residual (total 0.0659s minus the ablated sections = 0.018s at the
# bench shape) — their split is apportioned, not separately measured
TPU_GLUE_S = 0.2e-9           # per slab-io word x lane (normalize + slice)
TPU_ENTS_BW = 100e9           # entries write+accumulation effective B/s
TPU_DISPATCH_S = 0.007        # per align_batch_mapped call (dispatch)


def expected_rows(W: int, O: int, error_rate: float, batch: int) -> float:
    """Expected DP rows per window with batched early termination: the
    max window edit distance over `batch` lockstep lanes, approximated
    from the Binomial(W-O, error_rate) upper tail."""
    tb = W - O
    mean = tb * error_rate
    std = math.sqrt(max(tb * error_rate * (1 - error_rate), 1e-9))
    # expected max of `batch` iid ~ mean + std * sqrt(2 ln batch)
    return min(mean + std * math.sqrt(2 * math.log(max(batch, 2))) + 1,
               W + 1)


def tpu_aligns_per_second(W: int = 64, K: int = 64, O: int = 33,
                          read_len: int = 10_000, error_rate: float = 0.05,
                          batch: int = 32_768, kw: int = 0,
                          sk: int = 0) -> dict:
    """Predicted kernel-only aligns/s/chip for the Pallas engine.

    Mirrors the engine's actual structure: an outer slab loop (ceil(
    windows/kw) kernel calls), per window a pattern-mask build, a two-row
    wavefront fill over ceil((rows+1)/2) passes of W+2 steps, a per-level
    traceback sweep over the stored columns, plus slab glue (normalize +
    contiguous slice) and the HBM entries accumulation. Kernel shapes
    (sk, kw) come from the real chooser unless overridden.

    Validation vs the recorded operating-point sweep (2026-08-19,
    profile/simulated_32768_10000_device_sweep_WO.csv, ET rows):
    within 15% for W in [32, 160] (-13%@32, -3%@64, -14%@96, -7%@128,
    +7%@160); -25% at W=256, where the per-lane linear-in-NW fill cost
    overestimates the 8-word bitvector's real cost."""
    from ..config import AlignConfig
    from ..ops import engine_pallas as ep

    cfg = AlignConfig(W=W, K=K, O=O)
    S = max(batch // 128, 1)
    if not (sk and kw):
        sk_c, kw_c = ep.choose_kernel_shape(cfg, S)
        sk, kw = sk or sk_c, kw or kw_c
    if not sk:
        return {"aligns_per_second": 0.0, "windows": 0, "rows_per_window": 0}
    nw = cfg.num_words
    nwh = cfg.num_tb_words
    cols = cfg.columns
    tb = cfg.tb_limit
    ne3 = ep.tb_rows(cfg)
    nwd = ep.slab_io_words(cfg, kw)
    windows = math.ceil(read_len / tb * (1 + error_rate))
    slabs = -(-windows // kw)
    rows = expected_rows(W, O, error_rate, sk * 128)
    passes = (rows + 2) / 2  # two DP rows per wavefront pass
    levels = min(rows, ep.tb_rows(cfg) / 2)

    fill_s = windows * batch * passes * (W + 2) * nw * TPU_FILL_S
    pm_s = windows * batch * W * TPU_PM_S
    tb_s = windows * batch * levels * cols * nwh * TPU_TB_S
    glue_s = slabs * nwd * batch * TPU_GLUE_S
    ents_s = slabs * kw * ne3 * batch * 2 / TPU_ENTS_BW
    total_s = fill_s + pm_s + tb_s + glue_s + ents_s + TPU_DISPATCH_S
    return {
        "windows": windows,
        "rows_per_window": rows,
        "sk": sk,
        "kw": kw,
        "fill_ms": fill_s * 1e3,
        "pm_ms": pm_s * 1e3,
        "tb_ms": tb_s * 1e3,
        "glue_ms": glue_s * 1e3,
        "ents_ms": ents_s * 1e3,
        "dispatch_ms": TPU_DISPATCH_S * 1e3,
        "aligns_per_second": batch / total_s,
    }


# --- Speed-of-light bound (v5e VPU port model) ----------------------
#
# Approximate public v5e core parameters (the role of plot.py:2338-2346's
# A6000 roofline inputs). The VPU executes (8, 128) int32 vector ops;
# ~4 ALU slots/cycle with separate VMEM load/store ports, ~1.5 GHz.
V5E_CLOCK_HZ = 1.5e9
V5E_VPU_ALUS = 4          # (8,128) ALU ops issued per cycle
V5E_VPU_LD_PORTS = 2      # (8,128) VMEM loads per cycle
V5E_VPU_ST_PORTS = 1      # (8,128) VMEM stores per cycle
V5E_HBM_BYTES_S = 819e9
DEFAULT_KW_SOL = 8


def tpu_speed_of_light(W: int = 64, K: int = 64, O: int = 33,
                       read_len: int = 10_000, error_rate: float = 0.05,
                       batch: int = 16_384, sk: int = 16,
                       kw: int = DEFAULT_KW_SOL) -> dict:
    """First-principles per-chip floor for the Pallas engine's kernel
    sections — the v5e analogue of the reference's roofline argument
    (plot.py:2338-2476), built from instruction counts read off the
    kernel source, not calibration.

    FILL (engine_pallas._pair_body): one wavefront step computes two DP
    cells and issues, per uint32 word-list op on a (sk, 128) tile
    (NW = ceil(W/32) words):
      3 multiword shl1            -> 3 * (2 shifts + or + mask) ~ 15 ALU
      mat/or + 3 and, rows A & B  -> 16 ALU
      ff/pm loads                 -> 2*NW ld
      R row stores + ff store     -> 2*NWH + NW st
    Steps per two-row pass = W+2; passes = ceil((rows+1)/2) with rows =
    the expected tile-max window distance under batched ET; windows =
    read_len/tb_limit * (1+e). Cycle floor per step = max(ALU/4, ld/2,
    st/1) * (sk/8) (an (sk,128) op is sk/8 VREG issues).

    TRACEBACK (level_body): per d-level, one pass over the stored
    columns extracts 3 decision bits (a word select + shift + and + xor
    ~ 13 ALU + NWH ld per column), then 3 multiword funnel shifts + mask
    algebra (~56 ALU).

    ENTRIES: the kernel's packed row store + the outer accumulation,
    bounded by HBM write bandwidth.

    The printed table reconciles each floor against the measured
    section (profile/ablation.csv) — the measured/floor ratios are the
    committed statement of remaining headroom and its causes (register
    pressure from the 7-tuple two-row carry, strided scalar-indexed R
    stores, per-level column loop overhead)."""
    from ..config import AlignConfig
    from ..ops import engine_pallas as ep

    cfg = AlignConfig(W=W, K=K, O=O)
    nw, nwh = cfg.num_words, cfg.num_tb_words
    tb = cfg.tb_limit
    cols = cfg.columns
    windows = math.ceil(read_len / tb * (1 + error_rate))
    rows = expected_rows(W, O, error_rate, sk * 128)
    passes = (rows + 2) / 2
    vreg = sk / 8  # VREG issues per (sk,128) op

    # fill
    alu = (3 * (2 + 1 + 1) + 16) * (nw / 2)  # itemized for NW words
    ld, st = 2 * nw, 2 * nwh + nw
    cyc_step = max(alu / V5E_VPU_ALUS, ld / V5E_VPU_LD_PORTS,
                   st / V5E_VPU_ST_PORTS) * vreg
    tiles = batch / (sk * 128)
    fill_s = tiles * windows * passes * (W + 2) * cyc_step / V5E_CLOCK_HZ

    # traceback
    alu_tb = cols * 13 * nwh + 56
    ld_tb = cols * nwh
    cyc_lvl = max(alu_tb / V5E_VPU_ALUS, ld_tb / V5E_VPU_LD_PORTS) * vreg
    tb_s = tiles * windows * rows * cyc_lvl / V5E_CLOCK_HZ

    # pattern masks: grouped build ~ (W/16 groups * 24 ALU) + W-step
    # text-select loop (4 selects * NW)
    alu_pm = (W // 16) * 24 * 4 + W * 4 * nw
    pm_s = tiles * windows * (alu_pm / V5E_VPU_ALUS) * vreg / V5E_CLOCK_HZ

    # entries: kernel write + one accumulation copy (read+write)
    ne3h = ep.tb_rows(cfg) // 2
    ents_bytes = batch * windows / kw * kw * ne3h * 4 * 3
    ents_s = ents_bytes / V5E_HBM_BYTES_S

    total = fill_s + tb_s + pm_s + ents_s
    return {
        "windows": windows, "rows_per_window": round(rows, 1),
        "fill_floor_ms": fill_s * 1e3, "tb_floor_ms": tb_s * 1e3,
        "pm_floor_ms": pm_s * 1e3, "ents_floor_ms": ents_s * 1e3,
        "total_floor_ms": total * 1e3,
        "aligns_per_second_floor": batch / total,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("mode", choices=["improvements", "sweep", "tpu", "sol"])
    p.add_argument("--out", default="asic_sweep.csv")
    p.add_argument("--W", type=int, default=64)
    p.add_argument("--K", type=int, default=64)
    p.add_argument("--O", type=int, default=33)
    p.add_argument("--read_len", type=int, default=10_000)
    p.add_argument("--error_rate", type=float, default=0.05)
    p.add_argument("--batch", type=int, default=32_768)
    args = p.parse_args(argv)

    if args.mode == "improvements":
        print_improvements()
    elif args.mode == "sweep":
        rows = sweep_rows()
        with open(args.out, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["W", "O", "SENE", "DENT", "area_mm2", "power_W",
                        "aligns_per_second_per_vault"])
            w.writerows(rows)
        print(f"wrote {len(rows)} rows to {args.out}")
    elif args.mode == "sol":
        pred = tpu_speed_of_light(args.W, args.K, args.O, args.read_len,
                                  args.error_rate, args.batch)
        for k, v in pred.items():
            print(f"{k}: {v:.2f}" if isinstance(v, float) else f"{k}: {v}")
    else:
        pred = tpu_aligns_per_second(args.W, args.K, args.O, args.read_len,
                                     args.error_rate, args.batch)
        for k, v in pred.items():
            print(f"{k}: {v:.1f}" if isinstance(v, float) else f"{k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
