"""Run logging: multi-run best-by-valid statistics + streaming meters.

Same reporting contract as the reference (``utils/logger.py:6-85``): per run
the (train, valid, test) triple per epoch; summary picks the epoch with the
best valid score and reports mean +/- std across runs.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np


class Logger:
    def __init__(self, runs: int, info=None):
        self.info = info
        self.results: List[List[Tuple[float, float, float]]] = [[] for _ in range(runs)]

    def add_result(self, run: int, result):
        assert len(result) == 3
        self.results[run].append(tuple(float(v) for v in result))

    def statistics(self, run=None):
        if run is not None:
            if not self.results[run]:
                return {}
            r = 100 * np.asarray(self.results[run])
            best = int(np.argmax(r[:, 1]))
            return {
                "highest_train": float(r[:, 0].max()),
                "highest_valid": float(r[:, 1].max()),
                "final_train": float(r[best, 0]),
                "final_test": float(r[best, 2]),
            }
        best_results = []
        for rr in self.results:
            if not rr:
                continue
            r = 100 * np.asarray(rr)
            best = int(np.argmax(r[:, 1]))
            best_results.append(
                (r[:, 0].max(), r[:, 1].max(), r[best, 0], r[best, 2])
            )
        if not best_results:
            return {}
        b = np.asarray(best_results)
        def ms(col):
            return float(b[:, col].mean()), float(b[:, col].std(ddof=1)) if len(b) > 1 else 0.0
        return {
            "highest_train": ms(0),
            "highest_valid": ms(1),
            "final_train": ms(2),
            "final_test": ms(3),
        }

    def print_statistics(self, run=None):
        if run is not None:
            s = self.statistics(run)
            if not s:
                print(f"Run {run + 1:02d}: no results")
                return
            print(f"Run {run + 1:02d}:")
            print(f"Highest Train: {s['highest_train']:.2f}")
            print(f"Highest Valid: {s['highest_valid']:.2f}")
            print(f"  Final Train: {s['final_train']:.2f}")
            print(f"   Final Test: {s['final_test']:.2f}")
        else:
            s = self.statistics()
            if not s:
                print("All runs: no results")
                return
            print("All runs:")
            for name, key in [
                ("Highest Train", "highest_train"),
                ("Highest Valid", "highest_valid"),
                ("  Final Train", "final_train"),
                ("   Final Test", "final_test"),
            ]:
                m, sd = s[key]
                print(f"{name}: {m:.2f} ± {sd:.2f}")


class AverageValueMeter:
    """Streaming mean/std (Welford), same contract as the reference meter."""

    def __init__(self):
        self.reset()

    def add(self, value, n=1):
        if n <= 0:
            raise ValueError("Cannot use a non-positive weight for the running stat.")
        self.val = value
        self.sum += value * n
        if self.n == 0:
            self.mean = 0.0 + value
            self.std = math.inf
            self._mean_old = self.mean
            self._m_s = 0.0
        else:
            self.mean = self._mean_old + n * (value - self._mean_old) / float(self.n + n)
            self._m_s += n * (value - self._mean_old) * (value - self.mean)
            self._mean_old = self.mean
            self.std = math.sqrt(self._m_s / (self.n + n - 1.0))
        self.n += n

    def value(self):
        return self.mean, self.std

    def reset(self):
        self.n = 0
        self.sum = 0.0
        self.val = 0.0
        self.mean = math.nan
        self.std = math.nan
        self._mean_old = 0.0
        self._m_s = 0.0
