"""``log:`` config section → a configured engine logger.

Spark analog of the reference's logger plumbing (pkg/config/base/log.go:
10-15 → pkg/logger): ``level`` / ``console`` / ``files`` / static ``fields``
apply to the ENGINE's own run/stage lines (a dedicated Python logger —
Spark's JVM logging stays log4j-managed, but ``level`` is also forwarded to
``sparkContext.setLogLevel`` so one knob quiets both planes).
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

from nebula_importer_spark.config.model import LogSpec

_LEVELS = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "error": logging.ERROR,
}
LOGGER_NAME = "nebula_importer_spark.run"


def build_logger(spec: LogSpec | None, spark=None) -> logging.Logger:
    """(Re)configure the engine run logger from a ``log:`` section. Called
    per run — handlers from a previous configuration are closed so repeated
    Pipeline.run() calls in one session do not multiply outputs. With
    ``spec=None`` the logger emits INFO lines to stderr."""
    spec = spec or LogSpec()
    logger = logging.getLogger(LOGGER_NAME)
    logger.propagate = False
    for h in list(logger.handlers):
        logger.removeHandler(h)
        h.close()
    level = _LEVELS[(spec.level or "info").lower()]
    logger.setLevel(level)
    prefix = "".join(f"{k}={v} " for k, v in sorted(spec.fields.items()))
    fmt = logging.Formatter(
        f"%(asctime)s %(levelname)s {prefix}%(message)s", "%Y-%m-%dT%H:%M:%S"
    )
    handlers: list[logging.Handler] = []
    if spec.console:
        handlers.append(logging.StreamHandler(sys.stderr))
    for f in spec.files:
        Path(f).parent.mkdir(parents=True, exist_ok=True)
        handlers.append(logging.FileHandler(f))
    for h in handlers:
        h.setFormatter(fmt)
        logger.addHandler(h)
    if spark is not None and spec.level:
        # one knob for both planes: warn quiets Spark's INFO chatter too
        spark.sparkContext.setLogLevel(spec.level.upper().replace("WARNING", "WARN"))
    return logger
