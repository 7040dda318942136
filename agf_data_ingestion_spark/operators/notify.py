"""Notification fallback chain (OP-SINK-ALERT delivery semantics).

The reference's ``send_notification`` (``lambda/agf_reconciliation_lambda.py:
292-345``) tries SNS, falls back to SES, and as a last resort prints the
report, then records a NotificationSuccess/NotificationFailure metric
(``:275-289``).  This module re-expresses that as a pluggable chain: each
channel is a callable that raises on failure; the chain walks channels in
order, stops at the first success, always falls through to an out-of-band
print of the report when every channel fails, and reports the outcome to an
optional metrics hook.

Cloud channels (SNS/SES/Slack/email) are deliberately NOT implemented here —
they are deployment glue; a caller wires them in as ``Notifier("sns",
lambda s, b: client.publish(...))``.  The chain logic — ordering, fallback,
last-resort print, metric — is the reference behavior under test.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Notifier:
    """One delivery channel: ``send(subject, body)`` raises on failure.

    ``max_subject`` mirrors SNS's 100-char subject cap (reference :304 —
    ``Subject=subject[:100]``): the chain truncates before delivery.
    """

    name: str
    send: Callable[[str, str], None]
    max_subject: int | None = None


def print_notifier(stream=None) -> Notifier:
    """The reference's terminal fallback: print the report (:327)."""

    def _send(subject: str, body: str) -> None:
        out = stream or sys.stdout
        print(f"{subject}\n{body}", file=out)

    return Notifier("print", _send)


@dataclass
class NotificationOutcome:
    sent: bool
    channel: str | None
    errors: list[tuple[str, str]] = field(default_factory=list)


class NotificationChain:
    """Ordered fallback delivery (reference SNS → SES → print).

    ``metrics_hook(success: bool)`` is invoked exactly once per ``notify``
    with the final outcome — the CloudWatch NotificationSuccess/Failure
    metric analog (:275-289); hook errors are swallowed like the
    reference's ``publish_notification_metric`` try/except.
    """

    def __init__(
        self,
        notifiers: list[Notifier],
        *,
        metrics_hook: Callable[[bool], None] | None = None,
        report_stream=None,
    ) -> None:
        self._notifiers = list(notifiers)
        self._metrics_hook = metrics_hook
        self._report_stream = report_stream

    def notify(self, subject: str, body: str) -> NotificationOutcome:
        outcome = NotificationOutcome(sent=False, channel=None)
        for n in self._notifiers:
            subj = subject[: n.max_subject] if n.max_subject else subject
            try:
                n.send(subj, body)
                outcome.sent, outcome.channel = True, n.name
                break
            except Exception as exc:  # noqa: BLE001 — any channel error → next
                outcome.errors.append((n.name, str(exc)))
        if not outcome.sent:
            # last resort, out of band: the report must never be lost
            # (reference :327 prints it after the final channel fails)
            print(f"{subject}\n{body}", file=self._report_stream or sys.stderr)
        if self._metrics_hook is not None:
            try:
                self._metrics_hook(outcome.sent)
            except Exception:  # noqa: BLE001 — metric failure is non-fatal
                pass
        return outcome


def reconciliation_subject(orphaned_in_storage: int, orphaned_in_db: int) -> str:
    """Reference subject line (:298)."""
    n = orphaned_in_storage + orphaned_in_db
    return f"[AGF] S3-DynamoDB Reconciliation: {n} discrepancies found"


def smtp_notifier(
    *,
    host: str,
    port: int = 25,
    sender: str,
    recipients: list[str],
    timeout_s: float = 10.0,
    starttls: bool = False,
    username: str | None = None,
    password: str | None = None,
) -> Notifier:
    """A REAL email transport built on stdlib ``smtplib`` — the SES-analog
    channel the chain was designed to carry (the reference falls back from
    SNS to SES email, ``agf_reconciliation_lambda.py:318-341``).  No cloud
    SDK involved: any deployment with an SMTP relay (or SES's SMTP
    endpoint) can wire alerts with nothing but this module.

    Raises on any transport failure, which is exactly what the chain
    needs to fall through to the next channel; connection setup happens
    per send (alerts are rare; a held-open connection would go stale).
    """
    import smtplib
    from email.message import EmailMessage

    def _send(subject: str, body: str) -> None:
        msg = EmailMessage()
        msg["Subject"] = subject
        msg["From"] = sender
        msg["To"] = ", ".join(recipients)
        msg.set_content(body)
        with smtplib.SMTP(host, port, timeout=timeout_s) as s:
            if starttls:
                s.starttls()
            if username is not None:
                s.login(username, password or "")
            s.send_message(msg)

    return Notifier("smtp", _send)
