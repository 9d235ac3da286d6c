"""Watch-mode re-render loop (the headless analogue of the reference
viewer's resize-triggered re-render, application.rs:334-355).

The reference re-renders the scene whenever the GLFW window is resized;
a TPU host has no window, so the interactive workflow it served —
tweak, look, tweak again — is recovered by watching a small JSON params
file: edit it, and the CLI re-renders with the new overrides.  The
in-process jit caches (plus the persistent XLA compile cache) make
repeat renders at the same shapes start in seconds.

Override keys accepted (validated here): width, height, samples, depth,
scene, seed, spp_chunk.  Unknown keys are reported and ignored rather
than crashing a running watch session.
"""

from __future__ import annotations

import json
import os
import time

ALLOWED_KEYS = {"width", "height", "samples", "depth", "scene", "seed",
                "spp_chunk"}


def load_overrides(path, log=None):
    """Parse the params file into a CLI-override dict.  Returns None on
    unreadable/invalid JSON (a half-written editor save — the caller
    keeps the previous params and retries on the next change)."""
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError) as e:
        if log is not None:
            log.warning("watch: cannot read %s (%s); keeping previous "
                        "params", path, e)
        return None
    if not isinstance(data, dict):
        if log is not None:
            log.warning("watch: %s is not a JSON object; ignoring", path)
        return None
    unknown = sorted(set(data) - ALLOWED_KEYS)
    if unknown and log is not None:
        log.warning("watch: ignoring unknown keys %s (accepted: %s)",
                    unknown, sorted(ALLOWED_KEYS))
    return {k: v for k, v in data.items() if k in ALLOWED_KEYS}


def watch_loop(path, on_change, poll_s: float = 0.5, log=None,
               max_iters=None):
    """Poll ``path``'s mtime; on change, parse it and call
    ``on_change(overrides)``.  A missing file simply waits (create it to
    trigger the first re-render).  ``max_iters`` bounds the number of
    polls for tests; production passes None and exits on Ctrl-C."""
    last = _mtime(path)
    iters = 0
    try:
        while max_iters is None or iters < max_iters:
            iters += 1
            time.sleep(poll_s)
            cur = _mtime(path)
            if cur == last:
                continue
            last = cur
            if cur is None:
                continue
            overrides = load_overrides(path, log=log)
            if overrides is None:
                continue
            on_change(overrides)
    except KeyboardInterrupt:
        if log is not None:
            log.info("watch: stopped")


def _mtime(path):
    try:
        return os.stat(path).st_mtime_ns
    except OSError:
        return None
