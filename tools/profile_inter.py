"""Device-side breakdown of the v2 inter search (vvc.enc.me).

Times the coarse program, each window-ME size program, the intra eval,
and the end-to-end rdo_inter_partition (forced syncs via np.asarray —
NOTE: block_until_ready does not actually block on the axon backend).

Usage:  python tools/profile_inter.py [W H [reps]]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 832
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 480
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    QP, BD = 32, 8

    from vvc.io.synth import synth_frame
    from vvc.enc import me as me_mod
    from vvc.enc import inter_search as isr
    from vvc.enc.rdo import pack_planes, eval_all_sizes, _candidate_sizes

    frames = [synth_frame(W, H, t) for t in range(5)]
    y = frames[4].y
    refs_l0 = [frames[0].y, frames[1].y]
    refs_l1 = [frames[2].y, frames[3].y]

    def t(fn, label, n=reps):
        fn()  # warmup/compile
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        dt = (time.perf_counter() - t0) / n
        print(f"  {label:<42s} {dt*1e3:9.1f} ms")

    print(f"profile_inter v2 {W}x{H}, 2+2 refs, affine on "
          f"({jax.devices()[0].platform})")

    pads, dss = [], []
    for r in refs_l0 + refs_l1:
        pp, ds = me_mod.pic_dev(r)
        pads.append(pp)
        dss.append(ds)
    refpad = jnp.stack(pads)
    dsstack = jnp.stack(dss)
    y_dev = jnp.asarray(y, jnp.int32)
    _, yds = me_mod._prep_ref(y_dev, H, W)
    h4, w4 = (H + 3) // 4, (W + 3) // 4
    qpj = jnp.int32(QP)

    t(lambda: np.asarray(me_mod._prep_ref(y_dev, H, W)[1]),
      "_prep_ref (pad + ds4, per new picture)")
    t(lambda: np.asarray(
        me_mod._coarse_program(yds, dsstack, h4, w4,
                               me_mod.COARSE_R)[64]),
      "coarse full-search (all sizes, 4 refs)")

    coarse = me_mod._coarse_program(yds, dsstack, h4, w4, me_mod.COARSE_R)
    for s in (64, 32, 16):
        def run(s=s):
            pk, pkc = isr._me_v2_program(y_dev, refpad, coarse[s], qpj,
                                         s, BD, W, H, 2, 2, True, True,
                                         s == 16)
            np.asarray(pk)
            if pkc is not None:
                np.asarray(pkc)
        t(run, f"_me_v2_program size={s}"
          + (" (+8 children)" if s == 16 else ""))

    sizes = _candidate_sizes(64, 8)
    t(lambda: np.asarray(
        eval_all_sizes(jax.device_put(pack_planes(y)), tuple(sizes),
                       qpj, BD, W, H)), "eval_all_sizes (intra)")

    t(lambda: isr.rdo_inter_partition(
        y, refs_l0, refs_l1, QP, BD, 64, 8, is_b=True, affine=True),
      "rdo_inter_partition end-to-end")


if __name__ == "__main__":
    main()
