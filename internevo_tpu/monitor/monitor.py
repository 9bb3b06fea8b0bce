"""Monitoring and alerting.

Parity: reference ``internlm/monitor/monitor.py`` — ``MonitorManager`` +
``MonitorTracker`` thread (:35-128) that checks training stuck-ness and loss
spikes on a cadence and fires Feishu webhook alerts, plus the
``initialize_monitor_manager`` context manager (:265) and ``send_alert_message``
(``monitor/alert.py``).  This environment is zero-egress, so the webhook call
logs instead of POSTing; the detection logic is intact.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from typing import Optional

from ..utils.logger import get_logger

logger = get_logger(__name__)

LAST_ACTIVE_TIMESTAMP = "LAST_ACTIVE_TIMESTAMP"


def set_env_var(key: str, value):
    os.environ[str(key)] = str(value)


def send_feishu_msg_with_webhook(webhook: str, title: str, message: str):
    """Zero-egress stub: record the alert instead of POSTing the webhook."""
    logger.warning("[ALERT] %s: %s (webhook=%s)", title, message, webhook)


_HEARTBEAT_EVERY = 50  # steps (reference light-monitor cadence, monitor/alert.py:16-90)
_last_heartbeat_step = -1


def send_heartbeat(msg_type: str, info: dict, step: Optional[int] = None,
                   every: int = _HEARTBEAT_EVERY) -> bool:
    """Light-monitor heartbeat (reference ``monitor/alert.py:16-90`` posts a
    {job, type, info} payload every 50 steps; ``train/pipeline.py:599-600``).
    Zero-egress environment: the payload goes to the log at the same cadence;
    returns True when a heartbeat fired (so tests can pin the cadence)."""
    global _last_heartbeat_step
    if step is not None:
        if step % every != 0 or step == _last_heartbeat_step:
            return False
        _last_heartbeat_step = step
    payload = {"job_name": os.environ.get("JOB_NAME", "internevo_tpu"),
               "msg_type": msg_type, "step": step, **info}
    logger.info("heartbeat %s", payload)
    return True


def send_alert_message(address: Optional[str] = None, title: str = "internevo_tpu", message: str = ""):
    if address:
        send_feishu_msg_with_webhook(address, title, message)
    else:
        logger.warning("[ALERT] %s: %s", title, message)


class MonitorTracker(threading.Thread):
    """Background thread: every ``check_interval`` seconds check (a) that the
    main loop advanced LAST_ACTIVE_TIMESTAMP, (b) that loss did not spike
    > spike_ratio vs the previous value (ref :35-126)."""

    def __init__(self, alert_address: Optional[str], check_interval: float = 300,
                 loss_spike_limit: float = 1.5):
        super().__init__(daemon=True)
        self.alert_address = alert_address
        self.check_interval = check_interval
        self.loss_spike_limit = loss_spike_limit
        self.last_active_time = -1
        self.last_loss_value = -1.0
        self.stopped = False
        self.current_loss = None
        self.current_step = 0

    def update(self, loss: float, step: int):
        self.current_loss = loss
        self.current_step = step
        set_env_var(LAST_ACTIVE_TIMESTAMP, int(time.time()))

    def run(self):
        while not self.stopped:
            time.sleep(self.check_interval)
            self._check_stuck()
            self._check_loss_spike()

    def _check_stuck(self):
        new_active_time = int(os.getenv(LAST_ACTIVE_TIMESTAMP, -1))
        if int(new_active_time) <= 0 or self.last_active_time == new_active_time:
            send_alert_message(self.alert_address, message="training may be in stuck status, please check it.")
        self.last_active_time = new_active_time

    def _check_loss_spike(self):
        if self.current_loss is None:
            return
        if self.last_loss_value > 0 and self.current_loss > self.loss_spike_limit * self.last_loss_value:
            send_alert_message(
                self.alert_address,
                message=f"loss spike may be happened in step {self.current_step}, "
                        f"loss value from {self.last_loss_value} to {self.current_loss}",
            )
        self.last_loss_value = self.current_loss

    def stop(self):
        self.stopped = True


class MonitorManager:
    def __init__(self, loss_spike_limit: float = 1.5):
        self.loss_spike_limit = loss_spike_limit
        self.monitor_thread: Optional[MonitorTracker] = None

    def start_monitor(self, job_name: str, alert_address: Optional[str],
                      monitor_interval_seconds: float = 300):
        if alert_address is None:
            return
        self.monitor_thread = MonitorTracker(alert_address, monitor_interval_seconds, self.loss_spike_limit)
        self.monitor_thread.start()

    def stop_monitor(self):
        if self.monitor_thread is not None:
            self.monitor_thread.stop()


monitor_manager = MonitorManager()


@contextlib.contextmanager
def initialize_monitor_manager(job_name: str = "job", alert_address: Optional[str] = None):
    if alert_address is not None:
        monitor_manager.start_monitor(job_name=job_name, alert_address=alert_address)
        send_alert_message(alert_address, message=f"training job {job_name} started")
    try:
        yield
    finally:
        if alert_address is not None:
            send_alert_message(alert_address, message=f"training job {job_name} completed")
            monitor_manager.stop_monitor()
