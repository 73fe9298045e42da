"""NavState: the 15-DoF inertial state (P, V, R, bg, ba) in the world
frame, plus the IMU kinematic model.

Parity: the reference's NavState (/root/reference/src/IMU/NavState.h:20-83)
keeps a fixed bias + optimized delta-bias; here the state is a flat pytree
and delta-biases live in the optimizer's tangent vector instead, which is
equivalent and simpler under AD. Body<->camera extrinsics (Tbc) convert
between NavState and the tracker's T_cw.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ygz_tpu.core import lie
from ygz_tpu.imu.preintegration import PreintState, bias_corrected


class NavState(NamedTuple):
    P: jnp.ndarray   # [3] body position in world
    V: jnp.ndarray   # [3] body velocity in world
    q: jnp.ndarray   # [4] R_wb (body->world rotation)
    bg: jnp.ndarray  # [3] gyro bias
    ba: jnp.ndarray  # [3] accel bias


def identity_navstate(dtype=jnp.float32) -> NavState:
    z = jnp.zeros(3, dtype)
    return NavState(P=z, V=z, q=lie.quat_identity(dtype), bg=z, ba=z)


def predict(ns: NavState, pre: PreintState, gw) -> NavState:
    """Propagate a NavState through preintegrated measurements (the IMU
    prediction used when the tracker has no visual pose yet — reference
    PredictNavStateByIMU, /root/reference/src/Tracking.cc:1994-2060)."""
    dt = pre.dt
    dP, dV, dR = bias_corrected(pre, jnp.zeros(3), jnp.zeros(3))
    Rwb = lie.quat_to_matrix(ns.q)
    P = ns.P + ns.V * dt + 0.5 * gw * dt * dt + Rwb @ dP
    V = ns.V + gw * dt + Rwb @ dV
    q = lie.quat_normalize(lie.quat_mul(ns.q, dR))
    return ns._replace(P=P, V=V, q=q)


def retract(ns: NavState, dx) -> NavState:
    """15-dof tangent update [dP(3), dV(3), dPhi(3), dbg(3), dba(3)];
    rotation updates on the right (body frame), matching the reference's
    IncSmallPVR/IncSmallBias (/root/reference/src/IMU/NavState.h:59-75)."""
    return NavState(
        P=ns.P + dx[0:3],
        V=ns.V + dx[3:6],
        q=lie.quat_normalize(lie.quat_mul(ns.q, lie.so3_exp(dx[6:9]))),
        bg=ns.bg + dx[9:12],
        ba=ns.ba + dx[12:15])


def imu_residual(ns_i: NavState, ns_j: NavState, pre: PreintState, gw):
    """9-dof preintegration residual [rP, rV, rPhi] between consecutive
    states (the EdgeNavStatePVR error of /root/reference/src/IMU/
    g2otypes.cpp, with Jacobians left to AD instead of hand-coded
    linearizeOplus). Assumes `pre` was integrated at exactly the states'
    biases; use imu_residual_biased otherwise."""
    return imu_residual_biased(ns_i, ns_j, pre, gw, ns_i.bg, ns_i.ba)


def imu_residual_biased(ns_i: NavState, ns_j: NavState, pre: PreintState,
                        gw, bg_hat, ba_hat):
    """Preintegration residual with a first-order bias correction from the
    integration-time biases (bg_hat, ba_hat) to the state's own."""
    dt = pre.dt
    dP, dV, dR = bias_corrected(pre, ns_i.bg - bg_hat, ns_i.ba - ba_hat)
    Riw = lie.quat_conj(ns_i.q)
    rP = lie.quat_rotate(Riw, ns_j.P - ns_i.P - ns_i.V * dt
                         - 0.5 * gw * dt * dt) - dP
    rV = lie.quat_rotate(Riw, ns_j.V - ns_i.V - gw * dt) - dV
    rR = lie.so3_log(lie.quat_mul(lie.quat_conj(dR),
                                  lie.quat_mul(Riw, ns_j.q)))
    return jnp.concatenate([rP, rV, rR])


def navstate_to_tcw(ns: NavState, Tbc):
    """NavState (world->body inverse...) -> camera pose T_cw given the
    body<-camera extrinsic Tbc (reference keeps Twb = (P, R_wb);
    Tcw = (Twb * Tbc)^-1)."""
    T_wb = {"q": ns.q, "t": ns.P}
    T_wc = lie.se3_compose(T_wb, Tbc)
    return lie.se3_inverse(T_wc)


def tcw_to_navstate(T_cw, Tbc, V=None, bg=None, ba=None) -> NavState:
    T_wc = lie.se3_inverse(T_cw)
    T_wb = lie.se3_compose(T_wc, lie.se3_inverse(Tbc))
    z = jnp.zeros(3)
    return NavState(P=T_wb["t"], V=z if V is None else V, q=T_wb["q"],
                    bg=z if bg is None else bg, ba=z if ba is None else ba)
