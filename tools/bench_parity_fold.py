"""Microbenchmark: hemispheric parity fold for the Legendre stages.

The reference folds N/S latitude pairs and splits even/odd total wavenumber
(spherical_fourier.F90:214-258), halving Legendre FLOPs. Our dense einsum
contracts full-latitude tables. This measures whether the 4-way index-parity
split (m even/odd x n even/odd strided slices -- no gathers) wins on the MXU
at GCM sizes, where tiles shrink from (nlat x N) to (nlat/2 x N/2).

Run on the real TPU: python tools/bench_parity_fold.py [T] [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from isca_tpu.spectral import transforms as tr


def folded_tables(T):
    """Split P/Pw tables by (m-index parity, n parity) on the northern half.

    Valid for fourier_inc=1 (m == index), where the mirror parity factor
    (-1)^(n+m) is even on the (::2,::2) and (1::2,1::2) blocks and odd on the
    cross blocks.
    """
    import numpy as np

    half = T.nlat // 2
    # slice on HOST: eager strided device ops stall/fail on the axon tunnel
    Pn = np.asarray(T.P)[half:]          # northern half, ascending latitude
    Pwn = np.asarray(T.Pw)[half:]
    blocks = {}
    for pm in (0, 1):
        for pn in (0, 1):
            blocks[(pm, pn)] = (jnp.asarray(Pn[:, pm::2, pn::2]),
                                jnp.asarray(Pwn[:, pm::2, pn::2]))
    return blocks


def spec_to_fourier_folded(T, blocks, s):
    """Synthesis with hemispheric fold; output (..., lat, m) complex."""
    half = T.nlat // 2
    ss = jnp.stack([s.real, s.imag], axis=0)
    outs_n = []
    outs_s = []
    for pm in (0, 1):
        sym = jnp.einsum("jmn,r...mn->r...jm", blocks[(pm, pm)][0],
                         ss[..., pm::2, pm::2], precision=T.prec)
        asym = jnp.einsum("jmn,r...mn->r...jm", blocks[(pm, 1 - pm)][0],
                          ss[..., pm::2, (1 - pm)::2], precision=T.prec)
        outs_n.append(sym + asym)
        outs_s.append(sym - asym)
    M1 = T.num_fourier + 1

    def interleave_m(parts):
        out = jnp.zeros(parts[0].shape[:-1] + (M1,), parts[0].dtype)
        out = out.at[..., ::2].set(parts[0])
        return out.at[..., 1::2].set(parts[1])

    FN = interleave_m(outs_n)                     # (r, ..., half, m)
    FS = interleave_m(outs_s)[..., ::-1, :]       # mirror back to ascending
    FF = jnp.concatenate([FS, FN], axis=-2)
    return jax.lax.complex(FF[0], FF[1])


def fourier_to_spec_folded(T, blocks, F):
    """Analysis with hemispheric fold; output (..., m, n) complex."""
    half = T.nlat // 2
    FF = jnp.stack([F.real, F.imag], axis=0)
    FS = FF[..., :half, :][..., ::-1, :]
    FN = FF[..., half:, :]
    Fsym = FN + FS
    Fasym = FN - FS
    N1 = T.num_spherical + 1
    M1 = T.num_fourier + 1
    out = jnp.zeros(FF.shape[:-2] + (M1, N1), FF.dtype)
    for pm in (0, 1):
        s_sym = jnp.einsum("jmn,r...jm->r...mn", blocks[(pm, pm)][1],
                           Fsym[..., pm::2], precision=T.prec)
        s_asym = jnp.einsum("jmn,r...jm->r...mn", blocks[(pm, 1 - pm)][1],
                            Fasym[..., pm::2], precision=T.prec)
        out = out.at[..., pm::2, pm::2].set(s_sym)
        out = out.at[..., pm::2, (1 - pm)::2].set(s_asym)
    return jax.lax.complex(out[0], out[1])


def timeit(fn, *args, iters=200):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e6  # us


def main():
    trunc = int(sys.argv[1]) if len(sys.argv) > 1 else 85
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    # string form selects the model's actual grid from RESOLUTIONS (e.g. T213
    # -> 640x320); a bare int would derive a next-power-of-two grid instead
    name = f"T{trunc}"
    T = tr.make_transforms(name if name in tr.RESOLUTIONS else trunc,
                           dtype=jnp.float32)
    # fold preconditions: hemisphere pairing needs even nlat; the (-1)^(n+m)
    # parity block structure needs fourier_inc == 1 (m == index)
    assert T.nlat % 2 == 0, "hemispheric fold requires even nlat"
    assert int(T.mvec[-1]) == T.num_fourier, "fold requires fourier_inc == 1"
    TOL = 1e-5  # few x f32 eps at GCM magnitudes
    blocks = folded_tables(T)
    kr, ki = jax.random.split(jax.random.PRNGKey(0))
    shape = (B, T.num_fourier + 1, T.num_spherical + 1)
    # complex built under jit (eager complex construction is unsupported on
    # the axon TPU backend; see .claude/skills/verify gotchas)
    s = jax.jit(lambda a, b, t: jax.lax.complex(a * t, b * t))(
        jax.random.normal(kr, shape, T.P.dtype),
        jax.random.normal(ki, shape, T.P.dtype), T.triangle)

    base_syn = jax.jit(lambda x: tr.spec_to_fourier(T, x))
    fold_syn = jax.jit(lambda x: spec_to_fourier_folded(T, blocks, x))
    F = base_syn(s)
    F2 = fold_syn(s)
    err = float(jnp.max(jnp.abs(F - F2)) / jnp.max(jnp.abs(F)))
    print(f"synthesis rel err: {err:.2e}")
    assert err < TOL, f"folded synthesis wrong: rel err {err:.2e} >= {TOL}"
    t_base = timeit(base_syn, s)
    t_fold = timeit(fold_syn, s)
    print(f"T{trunc} B={B} synthesis: base {t_base:.1f}us fold {t_fold:.1f}us "
          f"({t_base / t_fold:.2f}x)")

    base_ana = jax.jit(lambda x: tr.fourier_to_spec(T, x))
    fold_ana = jax.jit(lambda x: fourier_to_spec_folded(T, blocks, x))
    sA = base_ana(F)
    sB = fold_ana(F)
    err = float(jnp.max(jnp.abs(sA * T.triangle - sB * T.triangle))
                / jnp.max(jnp.abs(sA * T.triangle)))
    print(f"analysis rel err: {err:.2e}")
    assert err < TOL, f"folded analysis wrong: rel err {err:.2e} >= {TOL}"
    t_base = timeit(base_ana, F)
    t_fold = timeit(fold_ana, F)
    print(f"T{trunc} B={B} analysis:  base {t_base:.1f}us fold {t_fold:.1f}us "
          f"({t_base / t_fold:.2f}x)")


if __name__ == "__main__":
    main()
