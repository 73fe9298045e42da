import sys, dataclasses
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, "/root/repo/tests")
import synthetic
from test_e2e_mono import small_config
from test_imu import DT, simulate_trajectory
from ygz_tpu.core import lie
from ygz_tpu.pipeline.system import System
from ygz_tpu.pipeline import vio as vio_mod

FPS = 10
STEPS_PER_FRAME = int(round(1.0 / FPS / DT))

def test_dbg():
    cfg = dataclasses.replace(small_config(), use_imu=True,
                              vins_init_time=8.0, fps=float(FPS),
                              gravity=9.81)
    n_frames = 100
    n_steps = n_frames * STEPS_PER_FRAME + 1
    P, V, qs, imu = simulate_trajectory(n_steps, seed=11, amp=0.5,
                                        rot_amp=0.35)
    tex = synthetic.make_texture(3)
    sys_ = System(cfg, use_loop_closing=False)
    tr = sys_.tracker

    from ygz_tpu.imu import vi_init as _vi
    _orig_init = _vi.try_init_vio
    def _patched(p_c, q_wb, pre, mask, pbc, grav):
        r = _orig_init(p_c, q_wb, pre, mask, pbc, grav)
        print(f"    init result: ok={bool(r.ok)} scale={float(r.scale):.4f} "
              f"|g|={float(np.linalg.norm(np.asarray(r.gw))):.3f}", flush=True)
        import numpy as _np
        pc = _np.asarray(p_c)
        print(f"    chain: n={len(pc)} dts={_np.asarray(pre.dt)[:6]}", flush=True)
        print(f"    p_c span={_np.linalg.norm(pc.max(0)-pc.min(0)):.3f} "
              f"steps={_np.linalg.norm(_np.diff(pc,axis=0),axis=1)[:6]}", flush=True)
        return r
    _vi.try_init_vio = _patched
    import ygz_tpu.pipeline.vio as _vm
    _vm.vi_init.try_init_vio = _patched
    orig = vio_mod.VioTracker._try_init_vio
    def patched(self):
        print(f"  try_init at t={self.last_frame.timestamp if self.last_frame else -1}, kfs={len(self.kf_order)}", flush=True)
        chain_quality()
        return orig(self)
    vio_mod.VioTracker._try_init_vio = patched
    # GT positions per frame for chain-quality check
    import ygz_tpu.imu.vi_init as _vii
    tr_ref = sys_.tracker
    def chain_quality():
        import numpy as _np
        order = tr_ref._init_chain_nodes()
        if order is None: return
        ts = _np.asarray(tr_ref.ms.kf_timestamp)[order]
        fidx = _np.round(ts * FPS).astype(int)
        gt_p = P[_np.clip(fidx,0,len(P)-1) * STEPS_PER_FRAME]
        pc = []
        for k in order:
            T_cw = {"q": tr_ref.ms.kf_q[k], "t": tr_ref.ms.kf_t[k]}
            pc.append(np.asarray(lie.se3_inverse(T_cw)["t"]))
        pc = _np.stack(pc)
        # similarity fit pc -> gt (Horn with scale)
        mu_a, mu_b = pc.mean(0), gt_p.mean(0)
        A, B = pc - mu_a, gt_p - mu_b
        s = _np.sqrt((B**2).sum() / max((A**2).sum(), 1e-12))
        U, S, Vt = _np.linalg.svd(A.T @ B)
        R = (U @ Vt).T
        res = B - s * (A @ R.T)
        print(f"    chain fit: s_map={s:.2f} resid_rms={_np.sqrt((res**2).mean()):.4f} "
              f"gt_span={_np.linalg.norm(gt_p.max(0)-gt_p.min(0)):.3f}", flush=True)
        print(f"    per-node |res|: {_np.round(_np.linalg.norm(res,axis=1),3)}", flush=True)

    for i in range(n_frames):
        k = i * STEPS_PER_FRAME
        T_wb = {"q": jnp.asarray(qs[k]), "t": jnp.asarray(P[k])}
        T_cw = lie.se3_inverse(T_wb)
        img = synthetic.render(tex, T_cw)
        rows = None
        if i > 0:
            a, b = (i - 1) * STEPS_PER_FRAME, k
            rows = np.concatenate(
                [np.full((b - a, 1), DT, np.float32), imu[a:b, 1:7]], axis=1)
        sys_.track_mono_vi(img, rows, i / FPS)
        if i % 10 == 0:
            print(f"f{i}: state={tr.state} nkf={tr.n_kf} order={len(getattr(tr,'kf_order',[]))} inited={getattr(tr,'vins_inited',None)}", flush=True)
    print("final:", tr.vins_inited, len(tr.kf_order), flush=True)
