"""Ground-truth pose provider for the '-p' flag — the reference's
GUI/Tools/GroundTruthOdometry.{h,cpp}.

The file format is TUM-style `ts x y z qx qy qz qw` (comma- or space-separated,
GroundTruthOdometry.cpp:25-48).  Per-frame deltas are chained exactly like the
reference computes them (camera_trajectory[last]^-1 * camera_trajectory[now],
GroundTruthOdometry.cpp:50-62), with one documented divergence: the Co-Fusion
fork passes the RAW DELTA to overridePose (CoFusion.cpp:342 via
MainController.cpp:386-390), dropping the accumulation ElasticFusion's original
performs — which makes the reference's '-p' replay only the last increment.  We
restore the accumulation so '-p' actually replays the trajectory.

`isam_basis=True` applies the reference's iSAM basis conversion
M^-1 * delta * M (GroundTruthOdometry.cpp:56-62) for trajectories stored in the
iSAM convention; default off for TUM/camera-convention files (which is what
dataset-tools and our own '-ep' exports produce).
"""

from __future__ import annotations

import numpy as np

_M_ISAM = np.array(
    [[0, 0, 1, 0], [-1, 0, 0, 0], [0, -1, 0, 0], [0, 0, 0, 1]], np.float64
)


class GroundTruthOdometry:
    def __init__(self, path: str, isam_basis: bool = False):
        from cofusion_tpu.utils.export import load_tum_trajectory

        ts, poses = load_tum_trajectory(path)
        if len(ts) == 0:
            raise IOError(f"no poses in {path}")
        self._by_ts = {int(t): poses[i] for i, t in enumerate(ts)}
        self._ts_sorted = np.asarray(sorted(self._by_ts.keys()), np.int64)
        self.isam_basis = isam_basis
        self._last_ts: int | None = None
        self._pose = np.eye(4, dtype=np.float64)

    def _lookup(self, timestamp: int) -> np.ndarray | None:
        if int(timestamp) in self._by_ts:
            return self._by_ts[int(timestamp)]
        # nearest-timestamp fallback (the reference requires exact matches and
        # silently skips otherwise); tolerate small jitter up to half a frame
        i = int(np.searchsorted(self._ts_sorted, timestamp))
        best, bd = None, None
        for j in (i - 1, i):
            if 0 <= j < len(self._ts_sorted):
                d = abs(int(self._ts_sorted[j]) - int(timestamp))
                if bd is None or d < bd:
                    best, bd = int(self._ts_sorted[j]), d
        if best is not None and len(self._ts_sorted) > 1:
            spacing = float(np.median(np.diff(self._ts_sorted)))
            if bd <= 0.5 * spacing:
                return self._by_ts[best]
        return None

    def pose_for(self, timestamp: int) -> np.ndarray:
        """Accumulated camera pose (identity at the first queried frame)."""
        T = self._lookup(timestamp)
        if T is None:
            # unknown timestamp: hold the last pose (reference returns identity
            # DELTA in this case, i.e. also holds)
            self._last_ts = None if self._last_ts is None else self._last_ts
            return self._pose.copy()
        if self._last_ts is not None:
            T_last = self._lookup(self._last_ts)
            if T_last is not None:
                delta = np.linalg.inv(T_last) @ T
                if self.isam_basis:
                    delta = np.linalg.inv(_M_ISAM) @ delta @ _M_ISAM
                self._pose = self._pose @ delta
        self._last_ts = int(timestamp)
        return self._pose.copy()
