"""Experiment environment: directory, config, logging, metrics.

Parity with /root/reference/scripts/env.py: owns the experiment directory,
validates `.hparams.json` into ExpConfig, appends timestamped lines to
`.log.txt`, pushes metrics to wandb when configured (console fallback
otherwise), acts as a context manager for the logger lifecycle, rewrites the
config in place to persist wandb run ids, and `fork()`s per-stage logger
views over the same config + log file.
"""

from __future__ import annotations

import datetime
import json
import pathlib
from typing import Any, Callable, Dict, Optional, TextIO, Tuple

from .config import Config_Logger, ExpConfig

try:
    import rich

    _console = rich.get_console()

    def _print(msg: str, style: Optional[str]) -> None:
        _console.print(msg, style=style)

except ImportError:  # pragma: no cover

    def _print(msg: str, style: Optional[str]) -> None:
        print(msg)


def _try_wandb():
    try:
        import wandb

        return wandb
    except ImportError:
        return None


class ExpEnv:
    def __init__(
        self,
        model_path: pathlib.Path,
        get_logger_opts: Callable[[ExpConfig], Optional[Config_Logger]] = (
            lambda cfg: None
        ),
        _forked: Optional[Tuple[ExpConfig, TextIO]] = None,
    ) -> None:
        self.model_path = pathlib.Path(model_path)
        self._get_logger_opts = get_logger_opts
        if not _forked:
            from ..utils.devices import ensure_cpu_backend

            ensure_cpu_backend()  # before any backend initializes
            with open(self.model_path / ".hparams.json", "r", encoding="utf-8") as f:
                self.config = ExpConfig.model_validate(json.load(f))
            self._log_fd = open(
                self.model_path / ".log.txt", "a", encoding="utf-8"
            )
            self.log(
                f"[[[ NEW RUN: load config from "
                f"{self.model_path.absolute().as_posix()} ]]]"
            )
        else:
            self.config, self._log_fd = _forked

    def fork(
        self, get_logger_opts: Callable[[ExpConfig], Optional[Config_Logger]]
    ) -> "ExpEnv":
        return ExpEnv(
            self.model_path, get_logger_opts,
            _forked=(self.config, self._log_fd),
        )

    def log(self, msg: str) -> None:
        ts = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S.%f")
        msg = f"[{ts}] {msg}"
        style: Optional[str] = None
        if "[[[" in msg and "]]]" in msg:
            if "!!!" in msg or "error" in msg or "failed" in msg:
                style = "bold red1"
            elif "..." in msg or "ing " in msg:
                style = "bold sky_blue2"
            elif "ok" in msg or "done" in msg or "ed " in msg:
                style = "bold green1"
            else:
                style = "pale_violet_red1"
        elif "!!! " in msg:
            style = "indian_red1"
        _print(msg, style)
        if not self._log_fd.closed:
            self._log_fd.write(msg + "\n")
            self._log_fd.flush()

    def metrics(self, data: Dict[str, Any]) -> None:
        opts = self._get_logger_opts(self.config)
        wandb = _try_wandb()
        if opts is not None and opts.wandb_enabled and wandb is not None:
            step = (opts.wandb_global_step or 0) + 1
            wandb.log(data, step=step)
            opts.wandb_global_step = step
        else:
            printable = {
                k: (v if isinstance(v, (float, int, str)) else f"<{type(v).__name__}>")
                for k, v in data.items()
            }
            self.log(f"METRICS: {printable}")

    def __enter__(self) -> "ExpEnv":
        opts = self._get_logger_opts(self.config)
        flattened = self.config.flatten_dump()
        self.log("CONFIG: " + json.dumps(flattened, indent=2))
        wandb = _try_wandb()
        if opts is not None and opts.wandb_enabled and wandb is not None:
            wandb.init(
                id=opts.wandb_run_id,
                project=opts.wandb_project,
                name=opts.wandb_name,
                config=flattened,
                resume="allow",
            )
            if wandb.run is not None:
                opts.wandb_run_id = wandb.run.id
                self.flush_cfg()
            self.log(
                f"[[[ wandb enabled: {opts.wandb_project} / {opts.wandb_name} / "
                f"{opts.wandb_run_id} ]]]"
            )
        return self

    def __exit__(self, *args) -> None:
        opts = self._get_logger_opts(self.config)
        wandb = _try_wandb()
        if opts is not None and opts.wandb_enabled and wandb is not None:
            if wandb.run is not None:
                wandb.run.finish()
                self.log("[[[ wandb finished ]]]")

    def flush_cfg(self) -> None:
        with open(self.model_path / ".hparams.json", "w", encoding="utf-8") as f:
            raw = self.config.model_dump_json(by_alias=True, exclude_unset=True)
            f.write(json.dumps(json.loads(raw), indent=2) + "\n")
        self.log("[i] updated config file")
