"""Logging setup — behavioral graft of the reference's
``setup_logging`` (/root/reference/utils.py:58-88): console + optional
file handler with independent levels, idempotent re-initialization (a
second call must not duplicate handlers), quiet mode raising the stream
threshold. Workers inherit Ray's log forwarding; this configures the
driver/CLI process."""

from __future__ import annotations

import logging

_FORMAT = "%(asctime)s %(levelname)s %(name)s: %(message)s"
_MARKER = "_image_report_ray_handler"


def setup_logging(
    stream_level: int = logging.INFO,
    file_level: int = logging.DEBUG,
    log_file: str | None = None,
    logger: logging.Logger | None = None,
) -> logging.Logger:
    """Configure the engine logger. Safe to call repeatedly — existing
    engine-owned handlers are replaced, never duplicated."""
    log = logger or logging.getLogger("image_report_ray")
    for h in [h for h in log.handlers if getattr(h, _MARKER, False)]:
        log.removeHandler(h)
        h.close()

    fmt = logging.Formatter(_FORMAT)
    sh = logging.StreamHandler()
    sh.setLevel(stream_level)
    sh.setFormatter(fmt)
    setattr(sh, _MARKER, True)
    log.addHandler(sh)

    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setLevel(file_level)
        fh.setFormatter(fmt)
        setattr(fh, _MARKER, True)
        log.addHandler(fh)

    log.setLevel(min(stream_level, file_level if log_file else stream_level))
    log.propagate = False
    return log
