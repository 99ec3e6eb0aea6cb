"""Multiprocessing fan-out for offline preprocessing jobs
(reference builder/utils/process_util.py:17-29)."""
from __future__ import annotations

import multiprocessing as mp
from typing import Callable, Iterable, List, Sequence


def run_multi_process(fn: Callable, tasks: Sequence, n_processes: int = 30
                      ) -> List:
    n = min(n_processes, max(1, len(tasks)), mp.cpu_count() * 4)
    if n <= 1 or len(tasks) <= 1:
        return [fn(t) for t in tasks]
    with mp.Pool(processes=n) as pool:
        return pool.map(fn, tasks)
