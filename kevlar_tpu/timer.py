"""Named wall-clock phase timers (parity with the reference's Timer)."""

import time


class Timer:
    def __init__(self):
        self._start_times = {}
        self._stop_times = {}

    def start(self, key=None):
        key = key or ''
        if key in self._start_times:
            raise ValueError('Timer already started for "' + key + '"')
        self._start_times[key] = time.time()

    def stop(self, key=None):
        key = key or ''
        if key not in self._start_times:
            raise ValueError('No timer started for "' + key + '"')
        self._stop_times[key] = time.time()
        return self._stop_times[key] - self._start_times[key]

    def probe(self, key=None):
        key = key or ''
        if key not in self._start_times:
            raise ValueError('No timer started for "' + key + '"')
        return time.time() - self._start_times[key]
