"""Public estimator API types: State, TrackingState, Trajectory.

Moral re-exposure of the reference's `okvis::ViInterface` surface
(okvis_common/include/okvis/ViInterface.hpp:170-342): the published state
struct, tracking quality, and the client-side `Trajectory` store that can
answer `get_state(t)` at arbitrary timestamps by IMU propagation from the
nearest estimator state (≙ Propagator/Trajectory, ViInterface.hpp:54-342).

The estimator/pipeline pushes updates through `Trajectory.update()` — the
equivalent of the optimised-graph callback, the one output channel.
"""

from __future__ import annotations

import bisect
import dataclasses
import enum
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from okvis2x_tpu.core import se3
from okvis2x_tpu.imu.preintegration import ImuParams


class TrackingQuality(enum.Enum):
    GOOD = 0
    MARGINAL = 1
    LOST = 2


@dataclasses.dataclass
class State:
    """Published estimator state (≙ okvis::State, ViInterface.hpp:170-188)."""

    id: int
    timestamp: float
    T_WS: np.ndarray  # (7,)
    v_W: np.ndarray  # (3,)
    b_g: np.ndarray  # (3,)
    b_a: np.ndarray  # (3,)
    omega_S: np.ndarray  # (3,)
    is_keyframe: bool = False
    covisible_frame_ids: Tuple[int, ...] = ()
    T_GW: Optional[np.ndarray] = None


@dataclasses.dataclass
class TrackingState:
    """(≙ okvis::TrackingState, ViInterface.hpp:191-206)."""

    id: int
    is_keyframe: bool
    quality: TrackingQuality
    current_keyframe_id: int
    recognised_place: bool = False
    is_fully_initialised: bool = False


class Trajectory:
    """Client-side state store with IMU propagation for arbitrary-time
    queries (≙ okvis::Trajectory, ViInterface.hpp:239-342)."""

    def __init__(self, imu_params: ImuParams = ImuParams()):
        self.imu = imu_params
        self._ts: List[float] = []
        self._states: List[State] = []
        self._by_id: Dict[int, State] = {}
        # raw IMU buffer for propagation beyond the newest state
        self._imu_t: List[float] = []
        self._imu_gyr: List[np.ndarray] = []
        self._imu_acc: List[np.ndarray] = []

    def update(self, state: State):
        """Consume an (updated) estimator state; replaces by id."""
        if state.id in self._by_id:
            old = self._by_id[state.id]
            i = self._ts.index(old.timestamp)
            self._states[i] = state
            self._ts[i] = state.timestamp
        else:
            i = bisect.bisect(self._ts, state.timestamp)
            self._ts.insert(i, state.timestamp)
            self._states.insert(i, state)
        self._by_id[state.id] = state

    def add_imu_measurement(self, t: float, gyr, acc):
        self._imu_t.append(float(t))
        self._imu_gyr.append(np.asarray(gyr, np.float64))
        self._imu_acc.append(np.asarray(acc, np.float64))

    def state_ids(self) -> List[int]:
        return [s.id for s in self._states]

    def get_state_by_id(self, sid: int) -> Optional[State]:
        return self._by_id.get(sid)

    def get_state(self, t: float) -> Optional[State]:
        """State at time t: nearest estimator state, IMU-propagated (Euler
        midpoint over the raw buffer) or constant-velocity extrapolated."""
        if not self._states:
            return None
        i = bisect.bisect(self._ts, t)
        if i == 0:
            return self._states[0]
        base = self._states[i - 1]
        if abs(base.timestamp - t) < 1e-9:
            return base
        return self._propagate(base, t)

    def _propagate(self, base: State, t: float) -> State:
        g_W = np.array([0.0, 0.0, -self.imu.g])
        T = jnp.asarray(base.T_WS)
        v = base.v_W.copy()
        p = base.T_WS[:3].copy()
        q = jnp.asarray(base.T_WS[3:7])
        t_cur = base.timestamp
        omega = np.zeros(3)

        idx = bisect.bisect(self._imu_t, base.timestamp)
        while t_cur < t:
            if idx < len(self._imu_t) and self._imu_t[idx] <= t:
                t_next = self._imu_t[idx]
                gyr = self._imu_gyr[idx] - base.b_g
                acc = self._imu_acc[idx] - base.b_a
                idx += 1
            else:
                t_next = t
                gyr = omega
                acc = (
                    np.asarray(se3.quat_to_matrix(q)).T @ (-g_W)
                )  # hover assumption
            dt = t_next - t_cur
            if dt > 0:
                C = np.asarray(se3.quat_to_matrix(q))
                a_W = C @ acc + g_W
                p = p + v * dt + 0.5 * a_W * dt * dt
                v = v + a_W * dt
                q = se3.quat_normalize(
                    se3.quat_multiply(q, se3.delta_q(jnp.asarray(gyr * dt)))
                )
            omega = gyr
            t_cur = t_next
        T_WS = np.concatenate([p, np.asarray(q)])
        return State(
            id=base.id,
            timestamp=t,
            T_WS=T_WS,
            v_W=v,
            b_g=base.b_g,
            b_a=base.b_a,
            omega_S=omega,
            is_keyframe=False,
        )

    def clear_imu_before(self, t: float):
        i = bisect.bisect(self._imu_t, t)
        del self._imu_t[: max(i - 1, 0)]
        del self._imu_gyr[: max(i - 1, 0)]
        del self._imu_acc[: max(i - 1, 0)]
