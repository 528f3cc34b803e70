"""Checkpoint notification actions — serializable configs + dry-run payload
rendering.

Mirrors the reference's action surface (``checkpoint/actions.py:106``
``ValidationAction``, ``:176`` Slack, ``:351`` Pagerduty, ``:414`` Teams,
``:482`` Opsgenie, ``:558`` Email, ``:786`` SNS, ``:826`` API): each action is
a dataclass config that round-trips JSON, gates on ``notify_on``
(all/failure/success — ``actions.py:145`` ``_should_notify``), and builds the
service payload.  Delivery is a pluggable transport: ``run(result,
dry_run=False)`` POSTs through ``HttpTransport`` (urllib, retry-on-5xx/429
with exponential backoff); inject any ``(url, body, headers) -> (status,
text)`` callable for a requests session or a test double.  This sandbox has
no network, so the default stays ``dry_run`` (rendered payload returned);
set ``live=True`` on the config to send when invoked by a checkpoint.

Checkpoint integration: ``run_checkpoint(actions=[SlackNotificationAction(
slack_webhook="https://…"), …])`` — action instances and plain callables are
both accepted.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field, fields
from typing import Any, ClassVar, Optional


class HttpTransport:
    """Default live transport: urllib POST with retry on 5xx/429 and network
    errors (exponential backoff), immediate failure on other 4xx — the
    semantics of the reference's requests-based senders
    (``checkpoint/actions.py:176`` SlackNotificationAction.run).  Inject any
    callable ``(url, body_bytes, headers) -> (status, response_text)`` in its
    place (a requests.Session adapter, a test double) via
    ``action.run(result, dry_run=False, transport=...)``."""

    def __init__(self, *, max_retries: int = 3, backoff_s: float = 1.0,
                 timeout_s: float = 10.0, sleep=None):
        import time

        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.timeout_s = timeout_s
        self.sleep = sleep if sleep is not None else time.sleep

    def __call__(self, url: str, body: bytes,
                 headers: dict[str, str]) -> tuple[int, str]:
        import urllib.error
        import urllib.request

        attempt = 0
        while True:
            try:
                req = urllib.request.Request(url, data=body, headers=headers)
                with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                    return r.status, r.read().decode("utf-8", "replace")
            except urllib.error.HTTPError as e:
                retryable = e.code == 429 or 500 <= e.code < 600
                if not retryable or attempt >= self.max_retries:
                    raise
            except urllib.error.URLError:
                if attempt >= self.max_retries:
                    raise
            attempt += 1
            self.sleep(self.backoff_s * 2 ** (attempt - 1))


def _should_notify(success: bool, notify_on: str) -> bool:
    """actions.py:145 — notify_on in {all, failure, success}."""
    return (
        notify_on == "all"
        or (notify_on == "success" and success)
        or (notify_on == "failure" and not success)
    )


def _result_summary(result: Any) -> dict[str, Any]:
    """Uniform summary over a CheckpointResult or SuiteValidationResult."""
    if hasattr(result, "combined_counts"):  # CheckpointResult
        counts = result.combined_counts()
        return {
            "success": bool(result.success),
            "run_name": result.run_id.run_name,
            "partitions_run": list(result.partitions_run),
            "partitions_skipped": list(result.partitions_skipped),
            **counts,
        }
    d = result.to_json_dict() if hasattr(result, "to_json_dict") else dict(result)
    stats = d.get("statistics", {})
    return {
        "success": bool(d.get("success")),
        "suite_name": d.get("suite_name", "suite"),
        "evaluated_expectations": stats.get("evaluated_expectations"),
        "successful_expectations": stats.get("successful_expectations"),
        "unsuccessful_expectations": stats.get("unsuccessful_expectations"),
    }


@dataclass
class ValidationAction:
    """Base action (reference ``actions.py:106``).  Subclasses implement
    ``render_payload``; ``run`` gates on ``notify_on`` and either returns the
    rendered payload (dry run) or performs the side effect."""

    type: ClassVar[str] = "action"
    name: str = "action"
    notify_on: str = "all"
    #: False (default) = dry-run when invoked as a checkpoint callable; True
    #: = live send through the transport.  Serialized with the config.
    live: bool = False

    # -- serializable-config round trip ------------------------------------ #
    def to_config(self) -> dict[str, Any]:
        cfg = asdict(self)
        cfg["type"] = self.type
        return cfg

    def to_json(self) -> str:
        return json.dumps(self.to_config(), sort_keys=True)

    @staticmethod
    def from_config(cfg: dict[str, Any] | str) -> "ValidationAction":
        if isinstance(cfg, str):
            cfg = json.loads(cfg)
        cfg = dict(cfg)
        t = cfg.pop("type")
        cls = ACTION_REGISTRY[t]
        allowed = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in allowed})

    # -- execution ---------------------------------------------------------- #
    def render_payload(self, result: Any) -> dict[str, Any]:
        raise NotImplementedError

    def run(self, result: Any, dry_run: Optional[bool] = None,
            transport=None) -> dict[str, Any]:
        if dry_run is None:
            dry_run = not self.live
        summary = _result_summary(result)
        if not _should_notify(summary["success"], self.notify_on):
            return {f"{self.type}_result": "none required"}
        payload = self.render_payload(result)
        if dry_run:
            return {f"{self.type}_result": "rendered", "payload": payload}
        return self._send(payload, transport)

    def _http_request(
        self, payload: dict[str, Any],
    ) -> Optional[tuple[str, bytes, dict[str, str]]]:
        """(url, body, headers) for HTTP-delivered actions; None for actions
        whose live delivery is not an HTTP POST (email/SNS)."""
        return None

    def _send(self, payload: dict[str, Any], transport=None) -> dict[str, Any]:
        req = self._http_request(payload)
        if req is None:
            raise NotImplementedError(
                f"{self.type}: live delivery needs a service client "
                "(smtp/boto3) — run with dry_run=True and deliver the "
                "rendered payload yourself"
            )
        url, body, headers = req
        if not url:
            raise ValueError(f"{self.type}: no endpoint configured")
        status, text = (transport or HttpTransport())(url, body, headers)
        return {f"{self.type}_result": status, "response": text[:200]}

    # checkpoint actions are plain callables: make instances callable
    def __call__(self, result: Any) -> dict[str, Any]:
        out = self.run(result)
        self.last_result = out
        return out


@dataclass
class SlackNotificationAction(ValidationAction):
    """actions.py:176 — Slack blocks payload (SlackRenderer shape)."""

    type: ClassVar[str] = "slack"
    name: str = "slack_notification"
    slack_webhook: Optional[str] = None
    slack_channel: Optional[str] = None
    show_failed_expectations: bool = True

    def render_payload(self, result: Any) -> dict[str, Any]:
        s = _result_summary(result)
        status = "Success :white_check_mark:" if s["success"] else "Failed :x:"
        title = f"*Validation {status}*"
        lines = [f"*Run*: {s.get('run_name', s.get('suite_name', ''))}"]
        if "row_count" in s:
            lines.append(
                f"*Rows*: {s['row_count']}  kept={s['keep_count']} "
                f"dropped={s['drop_count']}"
            )
        if s.get("evaluated_expectations") is not None:
            lines.append(
                f"*Expectations*: {s['successful_expectations']}/"
                f"{s['evaluated_expectations']} succeeded"
            )
        if self.show_failed_expectations:
            failed = _failed_expectations(result)
            if failed:
                lines.append("*Failed*: " + ", ".join(failed[:10]))
        blocks = [
            {"type": "section", "text": {"type": "mrkdwn", "text": title}},
            {"type": "section", "text": {"type": "mrkdwn", "text": "\n".join(lines)}},
        ]
        out: dict[str, Any] = {"blocks": blocks, "text": title}
        if self.slack_channel:
            out["channel"] = self.slack_channel
        return out

    def _http_request(self, payload):
        return (self.slack_webhook, json.dumps(payload).encode(),
                {"Content-Type": "application/json"})


@dataclass
class EmailAction(ValidationAction):
    """actions.py:558 — renders subject + HTML body (EmailRenderer shape)."""

    type: ClassVar[str] = "email"
    name: str = "email_notification"
    smtp_address: Optional[str] = None
    smtp_port: int = 587
    sender_login: Optional[str] = None
    receiver_emails: str = ""  # comma-separated, reference parity
    use_tls: bool = True

    def render_payload(self, result: Any) -> dict[str, Any]:
        s = _result_summary(result)
        status = "Success ✓" if s["success"] else "Failed ✗"
        subject = f"Validation {status}: {s.get('run_name', s.get('suite_name', ''))}"
        rows = "".join(
            f"<tr><td>{k}</td><td>{v}</td></tr>" for k, v in sorted(s.items())
        )
        html_body = (
            f"<p><strong>{subject}</strong></p><table>{rows}</table>"
        )
        failed = _failed_expectations(result)
        if failed:
            html_body += "<p>Failed expectations:</p><ul>" + "".join(
                f"<li>{f}</li>" for f in failed[:20]
            ) + "</ul>"
        return {
            "subject": subject,
            "html": html_body,
            "receivers": [e.strip() for e in self.receiver_emails.split(",") if e.strip()],
        }


@dataclass
class MicrosoftTeamsNotificationAction(ValidationAction):
    """actions.py:414 — MessageCard payload (TeamsRenderer shape)."""

    type: ClassVar[str] = "microsoft_teams"
    name: str = "teams_notification"
    teams_webhook: Optional[str] = None

    def render_payload(self, result: Any) -> dict[str, Any]:
        s = _result_summary(result)
        facts = [{"name": k, "value": str(v)} for k, v in sorted(s.items())]
        return {
            "@type": "MessageCard",
            "@context": "http://schema.org/extensions",
            "themeColor": "00FF00" if s["success"] else "FF0000",
            "summary": "Validation results",
            "sections": [{
                "activityTitle": (
                    "Validation succeeded!" if s["success"] else "Validation failed!"
                ),
                "facts": facts,
            }],
        }

    def _http_request(self, payload):
        return (self.teams_webhook, json.dumps(payload).encode(),
                {"Content-Type": "application/json"})


@dataclass
class PagerdutyAlertAction(ValidationAction):
    """actions.py:351 — Events-API-v2 alert body."""

    type: ClassVar[str] = "pagerduty"
    name: str = "pagerduty_alert"
    api_key: Optional[str] = None
    routing_key: Optional[str] = None
    notify_on: str = "failure"  # reference default: page on failure

    def render_payload(self, result: Any) -> dict[str, Any]:
        s = _result_summary(result)
        run = s.get("run_name", s.get("suite_name", ""))
        return {
            "routing_key": self.routing_key,
            "event_action": "trigger",
            "dedup_key": f"validation-{run}",
            "payload": {
                "summary": f"Validation {'succeeded' if s['success'] else 'failed'}: {run}",
                "severity": "info" if s["success"] else "critical",
                "source": "great_expectations_ray",
                "custom_details": s,
            },
        }

    def _http_request(self, payload):
        return ("https://events.pagerduty.com/v2/enqueue",
                json.dumps(payload).encode(),
                {"Content-Type": "application/json"})


@dataclass
class OpsgenieAlertAction(ValidationAction):
    """actions.py:482 — Opsgenie alert body."""

    type: ClassVar[str] = "opsgenie"
    name: str = "opsgenie_alert"
    api_key: Optional[str] = None
    region: Optional[str] = None
    priority: str = "P3"
    tags: list[str] = field(default_factory=list)
    notify_on: str = "failure"

    def render_payload(self, result: Any) -> dict[str, Any]:
        s = _result_summary(result)
        run = s.get("run_name", s.get("suite_name", ""))
        return {
            "message": f"Validation {'succeeded' if s['success'] else 'failed'}: {run}",
            "description": json.dumps(s, sort_keys=True),
            "priority": self.priority,
            "tags": list(self.tags),
        }

    def _http_request(self, payload):
        host = (f"https://api.{self.region}.opsgenie.com"
                if self.region else "https://api.opsgenie.com")
        return (host + "/v2/alerts", json.dumps(payload).encode(),
                {"Content-Type": "application/json",
                 "Authorization": f"GenieKey {self.api_key}"})


@dataclass
class SNSNotificationAction(ValidationAction):
    """actions.py:786 — SNS publish kwargs."""

    type: ClassVar[str] = "sns"
    name: str = "sns_notification"
    sns_topic_arn: Optional[str] = None
    sns_message_subject: Optional[str] = None

    def render_payload(self, result: Any) -> dict[str, Any]:
        s = _result_summary(result)
        return {
            "TopicArn": self.sns_topic_arn,
            "Subject": self.sns_message_subject
            or f"Validation {'Success' if s['success'] else 'Failure'}",
            "Message": json.dumps(s, sort_keys=True),
            "MessageStructure": "string",
        }


@dataclass
class APINotificationAction(ValidationAction):
    """actions.py:826 — POST the serialized results to an arbitrary URL
    (``create_payload`` shape: data_asset_name / suite / results)."""

    type: ClassVar[str] = "api"
    name: str = "api_notification"
    url: Optional[str] = None

    def render_payload(self, result: Any) -> dict[str, Any]:
        s = _result_summary(result)
        d = result.to_json_dict() if hasattr(result, "to_json_dict") else None
        return {
            "url": self.url,
            "data_asset_name": s.get("run_name", s.get("suite_name", "")),
            "suite_name": s.get("suite_name", ""),
            "validation_results": d if d is not None else s,
        }

    def _http_request(self, payload):
        body = {k: v for k, v in payload.items() if k != "url"}
        return (self.url, json.dumps(body, default=str).encode(),
                {"Content-Type": "application/json"})


@dataclass
class UpdateDataDocsAction(ValidationAction):
    """actions.py:680 — rebuild the static HTML site after a run."""

    type: ClassVar[str] = "update_data_docs"
    name: str = "update_data_docs"
    site_root: Optional[str] = None

    def render_payload(self, result: Any) -> dict[str, Any]:
        from great_expectations_ray.pipelines.data_docs import build_site, write_data_docs

        pages: dict[str, Any] = {}
        if hasattr(result, "combined_counts") and self.site_root:
            pages["summary"] = write_data_docs(self.site_root, result)
            pages["site"] = build_site(self.site_root)
        return pages

    def run(self, result: Any, dry_run: Optional[bool] = None,
            transport=None) -> dict[str, Any]:
        # docs update is a local filesystem effect — never gated on dry_run
        return {"update_data_docs_result": self.render_payload(result)}


def _failed_expectations(result: Any) -> list[str]:
    """Names of failed expectations (suite result) or failing groups
    (checkpoint result)."""
    out: list[str] = []
    if hasattr(result, "results"):  # SuiteValidationResult
        for evr in result.results:
            if not evr.success:
                cfg = evr.expectation_config or {}
                col = (cfg.get("kwargs") or {}).get("column")
                out.append(cfg.get("expectation_type", "?") + (f"({col})" if col else ""))
    elif hasattr(result, "rollups"):
        for pid, rep in sorted(result.rollups.items()):
            for grp in rep:
                if not grp["statistics"]["success"]:
                    keys = {k: v for k, v in grp.items()
                            if k not in ("results", "statistics", "row_count",
                                         "keep_count", "drop_count")}
                    out.append(f"{pid}:{json.dumps(keys, sort_keys=True)}")
    return out


ACTION_REGISTRY: dict[str, type[ValidationAction]] = {
    cls.type: cls
    for cls in (
        SlackNotificationAction, EmailAction, MicrosoftTeamsNotificationAction,
        PagerdutyAlertAction, OpsgenieAlertAction, SNSNotificationAction,
        APINotificationAction, UpdateDataDocsAction,
    )
}
