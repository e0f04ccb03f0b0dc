"""Detection-threshold email alarm
(parity: ref:ultralytics/solutions/security_alarm.py).

``monitor(im0)`` annotates detections and fires a one-shot email when
the per-frame detection count exceeds ``records``
(ref:security_alarm.py:110-144).  ``authenticate`` opens the SMTP
session; tests inject a fake server object through the same attribute
the reference uses (``self.server``), so no network is required.
"""

from __future__ import annotations

import numpy as np

from xlstm_yolo_tpu.solutions.base import BaseSolution


class SecurityAlarm(BaseSolution):
    def __init__(self, records: int = 5, **kwargs):
        super().__init__(**kwargs)
        self.records = records
        self.email_sent = False
        self.server = None
        self.from_email = ""
        self.to_email = ""

    def authenticate(self, from_email: str, password: str, to_email: str,
                     host: str = "smtp.gmail.com", port: int = 587):
        """Open a STARTTLS SMTP session (ref:security_alarm.py:41-63)."""
        import smtplib

        self.server = smtplib.SMTP(host, port)
        self.server.starttls()
        self.server.login(from_email, password)
        self.from_email = from_email
        self.to_email = to_email

    def send_email(self, im0: np.ndarray, records: int = 5):
        """Compose and send the alert with the frame attached."""
        from email.mime.image import MIMEImage
        from email.mime.multipart import MIMEMultipart
        from email.mime.text import MIMEText

        import cv2

        if self.server is None:
            raise RuntimeError("authenticate() (or inject .server) first")
        msg = MIMEMultipart()
        msg["From"] = self.from_email
        msg["To"] = self.to_email
        msg["Subject"] = "Security Alert"
        msg.attach(MIMEText(f"ALERT: {records} objects have been detected!"))
        img_bytes = cv2.imencode(".jpg", im0)[1].tobytes()
        msg.attach(MIMEImage(img_bytes, name="alert.jpg"))
        self.server.send_message(msg)

    def check(self, tracks: np.ndarray, im0: np.ndarray | None = None) -> bool:
        """Row-level threshold check; fires the one-shot email."""
        total = len(np.asarray(tracks).reshape(-1, 7))
        if total > self.records and not self.email_sent:
            if self.server is not None and im0 is not None:
                self.send_email(im0, total)
            self.email_sent = True
            return True
        return False

    def monitor(self, im0: np.ndarray) -> np.ndarray:
        """Track -> annotate -> alert when count exceeds the threshold."""
        tracks = self.extract_tracks(im0)
        for row in tracks:
            cls = int(row[6])
            self.box_label(im0, row[:4], str(self.names.get(cls, cls)),
                           self.color(cls))
        self.check(tracks, im0)
        self.display_output(im0)
        return im0
