"""Input-DMA floor probes: can explicit double-buffered DMA beat the
auto-pipelined BlockSpec input path?

VERDICT r2: the fused kernel's io probe measures ~32 us/frame for 13.2 MB
of input where ~16 us is theoretical (820 GB/s HBM), and the compute does
NOT hide it -- input DMA is the top single-chip lever.  These probes
isolate the delivery mechanism with a minimal reduce as the compute body
(the same shape as pallas_pipeline's "io" schedule):

  auto     -- pallas grid auto-pipelining, (ts, a, n1, n2) VMEM blocks
              (the shipped kernel's input path; baseline)
  manualN  -- input refs in ANY (HBM) memory space; the kernel runs its own
              N-deep rotating VMEM scratch with pltpu.make_async_copy,
              starting the copy of window w+N-1 before computing window w
  manualNs -- same, but each window's plane is split into per-symbol DMAs
              (more outstanding transfers -> more DMA queues engaged)

Anti-elision: a tiny [n1, n2] bias plane added to the reduce varies per
repetition, so the pallas call is not loop-invariant while the 13 MB
frames stay untouched (the bench.py R-loop pattern).

Usage:  python tools/dma_probe.py [--variants auto,manual2,manual3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def make_io_fn(variant: str, s: int, a: int, n1: int, n2: int, ts: int,
               compute: int = 0):
    """fn: (yre, yim [S, A, n1, n2], bias [n1, n2]) -> (outre, outim
    [S, n1, n2]): input delivery + antenna-sum reduce (+ bias) + write.

    ``compute`` adds N dependency-chained MXU dots per window on the
    resident scratch -- the overlap experiment: if total time ~= max(io,
    compute) the DMA hides behind compute; if ~= io + compute they
    serialize (the shipped kernel's r2 probes measured additive)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_steps = (s + ts - 1) // ts

    def burn(x2d, w, n):
        """n chained [R, n2] x [n2, n2] bf16 dots (MXU work, VMEM-resident)."""
        acc = x2d.astype(jnp.bfloat16)
        for _ in range(n):
            acc = jnp.dot(acc, w, preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)
        return acc.astype(jnp.float32)

    if variant == "auto":
        def kernel(yre_ref, yim_ref, b_ref, w_ref, outre_ref, outim_ref):
            b = b_ref[:][None]
            extra = 0.0
            if compute:
                burned = burn(yre_ref[:].reshape(ts * a * n1, n2),
                              w_ref[:].astype(jnp.bfloat16), compute)
                extra = jnp.sum(burned.reshape(ts, a, n1, n2),
                                axis=1) * 1e-9
            for k in range(ts):
                outre_ref[k:k + 1] = (jnp.sum(yre_ref[k:k + 1], axis=1) + b
                                      + (extra[k:k + 1] if compute else 0.0))
                outim_ref[k:k + 1] = jnp.sum(yim_ref[k:k + 1], axis=1) + b

        block_y = pl.BlockSpec((ts, a, n1, n2), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        bias_spec = pl.BlockSpec((n1, n2), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
        w_spec = pl.BlockSpec((n2, n2), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((ts, n1, n2), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        def fn(yre, yim, bias, w):
            return pl.pallas_call(
                kernel, grid=(n_steps,),
                in_specs=[block_y, block_y, bias_spec, w_spec],
                out_specs=(out_spec, out_spec),
                out_shape=(jax.ShapeDtypeStruct((s, n1, n2), jnp.float32),
                           jax.ShapeDtypeStruct((s, n1, n2), jnp.float32)),
            )(yre, yim, bias, w)
        return fn

    depth = int(variant[6])
    per_symbol = variant.endswith("s")
    n_in_sems = ts if per_symbol else 1

    def kernel(yre_hbm, yim_hbm, b_ref, w_ref, outre_hbm, outim_hbm,
               sre, sim, ore, oim, in_sems, out_sems):
        i = pl.program_id(0)

        def win_start(w):
            # Clamped ragged tail: the last window re-covers earlier rows;
            # output rewrites are idempotent.
            return jnp.minimum(w * ts, s - ts)

        def copies(w, slot):
            st = win_start(w)
            cs = []
            if per_symbol:
                for k in range(ts):
                    cs.append(pltpu.make_async_copy(
                        yre_hbm.at[pl.ds(st + k, 1)],
                        sre.at[slot, pl.ds(k, 1)], in_sems.at[slot, 0, k]))
                    cs.append(pltpu.make_async_copy(
                        yim_hbm.at[pl.ds(st + k, 1)],
                        sim.at[slot, pl.ds(k, 1)], in_sems.at[slot, 1, k]))
            else:
                cs.append(pltpu.make_async_copy(
                    yre_hbm.at[pl.ds(st, ts)], sre.at[slot],
                    in_sems.at[slot, 0, 0]))
                cs.append(pltpu.make_async_copy(
                    yim_hbm.at[pl.ds(st, ts)], sim.at[slot],
                    in_sems.at[slot, 1, 0]))
            return cs

        @pl.when(i == 0)
        def _():
            for w in range(min(depth, n_steps)):
                for c in copies(w, w % depth):
                    c.start()

        @pl.when((i > 0) & (i + depth - 1 < n_steps))
        def _():
            w = i + depth - 1
            for c in copies(w, w % depth):
                c.start()

        slot = i % depth
        for c in copies(i, slot):
            c.wait()

        oslot = i % 2

        def out_copies(w, os_):
            ws = win_start(w)
            return [pltpu.make_async_copy(ore.at[os_],
                                          outre_hbm.at[pl.ds(ws, ts)],
                                          out_sems.at[os_, 0]),
                    pltpu.make_async_copy(oim.at[os_],
                                          outim_hbm.at[pl.ds(ws, ts)],
                                          out_sems.at[os_, 1])]

        # The out-DMA that used this staging slot two steps ago must land
        # before the slot is overwritten.
        @pl.when(i >= 2)
        def _():
            for c in out_copies(i - 2, oslot):
                c.wait()

        b = b_ref[:][None]
        red_re = jnp.sum(sre[slot], axis=1) + b
        if compute:
            # MXU work on the PREVIOUS window's scratch slot would need a
            # third buffer; burning the current slot AFTER its wait models
            # the shipped kernel's structure (compute consumes the window
            # the DMA just delivered while window i+1's DMA is in flight).
            burned = burn(sre[slot].reshape(ts * a * n1, n2),
                          w_ref[:].astype(jnp.bfloat16), compute)
            red_re = red_re + jnp.sum(burned.reshape(ts, a, n1, n2),
                                      axis=1) * 1e-9
        ore[oslot] = red_re
        oim[oslot] = jnp.sum(sim[slot], axis=1) + b
        for c in out_copies(i, oslot):
            c.start()

        @pl.when(i == n_steps - 1)
        def _():
            for c in out_copies(i, oslot):
                c.wait()
            if n_steps >= 2:
                for c in out_copies(i - 1, (i - 1) % 2):
                    c.wait()

    def fn(yre, yim, bias, w):
        return pl.pallas_call(
            kernel, grid=(n_steps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec((n1, n2), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((n2, n2), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)),
            out_shape=(jax.ShapeDtypeStruct((s, n1, n2), jnp.float32),
                       jax.ShapeDtypeStruct((s, n1, n2), jnp.float32)),
            scratch_shapes=[
                pltpu.VMEM((depth, ts, a, n1, n2), jnp.float32),
                pltpu.VMEM((depth, ts, a, n1, n2), jnp.float32),
                pltpu.VMEM((2, ts, n1, n2), jnp.float32),
                pltpu.VMEM((2, ts, n1, n2), jnp.float32),
                pltpu.SemaphoreType.DMA((depth, 2, n_in_sems)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(yre, yim, bias, w)
    return fn


def main():
    from bench import wait_for_device
    if not wait_for_device():
        raise SystemExit("TPU never became available "
                         "(stale chip claim or tunnel down)")

    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="auto,manual2,manual3")
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--r-hi", type=int, default=101)
    ap.add_argument("--antennas", type=int, default=16)
    ap.add_argument("--fft", type=int, default=1024)
    ap.add_argument("--symbols", type=int, default=101)
    ap.add_argument("--ts", type=int, default=8)
    ap.add_argument("--compute", type=int, default=0, metavar="N",
                    help="add N dependency-chained MXU dots per window "
                         "(overlap experiment: additive vs max)")
    ap.add_argument("--check", action="store_true",
                    help="verify each variant's output against NumPy first")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ofdm_ls_mrc_tpu.ops.fastpath import _fast_split

    a, f, s, k, ts = args.antennas, args.fft, args.symbols, args.batch, args.ts
    n1, n2 = _fast_split(f)
    rng = np.random.default_rng(0)
    yre_h = rng.standard_normal((k, s, a, n1, n2)).astype(np.float32)
    yim_h = rng.standard_normal((k, s, a, n1, n2)).astype(np.float32)
    yre, yim = jax.device_put(yre_h), jax.device_put(yim_h)

    wmat = jnp.asarray(rng.standard_normal((n2, n2)).astype(np.float32) * 0.1)

    def measure(variant):
        io_fn = make_io_fn(variant, s, a, n1, n2, ts, compute=args.compute)

        if args.check:
            got = np.asarray(jax.jit(io_fn)(
                yre[0], yim[0], jnp.zeros((n1, n2), jnp.float32), wmat)[0])
            want = yre_h[0].sum(axis=1)
            err = np.max(np.abs(got - want)) / np.max(np.abs(want))
            print(f"  {variant}: max rel err vs numpy {err:.2e}", flush=True)

        def prog_factory(r):
            def prog(yre, yim, c0):
                def rep(_, acc):
                    def body(cacc, planes):
                        xr, xi = planes
                        bias = jnp.full((n1, n2), cacc, jnp.float32)
                        orr, oi = io_fn(xr, xi, bias, wmat)
                        return cacc + (jnp.sum(orr[0, 0, :8])
                                       + jnp.sum(oi[0, 0, :8])) * 1e-20, None
                    cacc, _ = jax.lax.scan(body, acc, (yre, yim))
                    return cacc
                return jax.lax.fori_loop(0, r, rep, c0)
            return jax.jit(prog)

        def timed(r):
            g = prog_factory(r)
            float(g(yre, yim, 0.0))
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                float(g(yre, yim, 0.0))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, thi = timed(1), timed(args.r_hi)
        return max(thi - t1, 1e-12) / ((args.r_hi - 1) * k)

    mb = s * a * f * 4 * 2 / 1e6
    for v in args.variants.split(","):
        t = measure(v)
        print(f"{v:10s} {t*1e6:8.2f} us/frame  ({mb:.1f} MB in -> "
              f"{mb / t / 1e3:7.1f} GB/s effective)", flush=True)


if __name__ == "__main__":
    main()
