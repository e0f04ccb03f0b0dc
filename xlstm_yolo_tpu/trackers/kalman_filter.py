"""Kalman filters for box tracking (constant-velocity, host-side numpy).

Re-derivation of the standard SORT-family filter
(ref:ultralytics/trackers/utils/kalman_filter.py:7,289): state is
(x, y, a, h, vx, vy, va, vh) for XYAH or (x, y, w, h, ...) for XYWH,
with measurement-scaled process/observation noise.
"""

from __future__ import annotations

import numpy as np

# 0.95 quantile of chi-square for gating (dims 1..9)
chi2inv95 = {1: 3.8415, 2: 5.9915, 3: 7.8147, 4: 9.4877, 5: 11.070,
             6: 12.592, 7: 14.067, 8: 15.507, 9: 16.919}


class KalmanFilterXYAH:
    """Track (center x, center y, aspect ratio, height) + velocities."""

    ndim = 4

    def __init__(self):
        dt = 1.0
        self._F = np.eye(8)
        for i in range(4):
            self._F[i, 4 + i] = dt
        self._H = np.eye(4, 8)
        self._std_weight_position = 1.0 / 20
        self._std_weight_velocity = 1.0 / 160

    def _std_pos(self, m):
        return [
            2 * self._std_weight_position * m[3],
            2 * self._std_weight_position * m[3],
            1e-2,
            2 * self._std_weight_position * m[3],
        ]

    def _std_vel(self, m):
        return [
            10 * self._std_weight_velocity * m[3],
            10 * self._std_weight_velocity * m[3],
            1e-5,
            10 * self._std_weight_velocity * m[3],
        ]

    def initiate(self, measurement: np.ndarray):
        mean = np.r_[measurement, np.zeros(4)]
        std = self._std_pos(measurement) + self._std_vel(measurement)
        cov = np.diag(np.square(std))
        return mean, cov

    def predict(self, mean, cov):
        std_pos = [
            self._std_weight_position * mean[3],
            self._std_weight_position * mean[3],
            1e-2,
            self._std_weight_position * mean[3],
        ]
        std_vel = [
            self._std_weight_velocity * mean[3],
            self._std_weight_velocity * mean[3],
            1e-5,
            self._std_weight_velocity * mean[3],
        ]
        Q = np.diag(np.square(np.r_[std_pos, std_vel]))
        mean = self._F @ mean
        cov = self._F @ cov @ self._F.T + Q
        return mean, cov

    def project(self, mean, cov):
        std = [
            self._std_weight_position * mean[3],
            self._std_weight_position * mean[3],
            1e-1,
            self._std_weight_position * mean[3],
        ]
        R = np.diag(np.square(std))
        pm = self._H @ mean
        pc = self._H @ cov @ self._H.T + R
        return pm, pc

    def update(self, mean, cov, measurement):
        pm, pc = self.project(mean, cov)
        K = np.linalg.solve(pc.T, (cov @ self._H.T).T).T  # Kalman gain
        innovation = measurement - pm
        mean = mean + K @ innovation
        cov = cov - K @ pc @ K.T
        return mean, cov

    def gating_distance(self, mean, cov, measurements, only_position=False):
        pm, pc = self.project(mean, cov)
        if only_position:
            pm, pc = pm[:2], pc[:2, :2]
            measurements = measurements[:, :2]
        L = np.linalg.cholesky(pc)
        d = measurements - pm
        z = np.linalg.solve(L, d.T)
        return np.sum(z * z, axis=0)


class KalmanFilterXYWH(KalmanFilterXYAH):
    """Same dynamics over (x, y, w, h) (BOT-SORT's parameterization)."""

    def _wh_std(self, m, w):
        return [w * m[2], w * m[3], w * m[2], w * m[3]]

    def initiate(self, measurement):
        mean = np.r_[measurement, np.zeros(4)]
        std = (
            self._wh_std(measurement, 2 * self._std_weight_position)
            + self._wh_std(measurement, 10 * self._std_weight_velocity)
        )
        return mean, np.diag(np.square(std))

    def predict(self, mean, cov):
        Q = np.diag(np.square(np.r_[
            self._wh_std(mean, self._std_weight_position),
            self._wh_std(mean, self._std_weight_velocity),
        ]))
        mean = self._F @ mean
        cov = self._F @ cov @ self._F.T + Q
        return mean, cov

    def project(self, mean, cov):
        R = np.diag(np.square(self._wh_std(mean, self._std_weight_position)))
        return self._H @ mean, self._H @ cov @ self._H.T + R
