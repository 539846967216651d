"""RFC-822 / MIME email extraction — pure stdlib ``email`` package.

Mail archives are a standard web-scale text source (mbox dumps, list
archives); extracting them means real MIME work: multipart traversal with
a text/plain preference, Content-Transfer-Encoding decode (quoted-printable
and base64 both exercised by the builders below), and RFC 2047 encoded-word
subject decoding.  A byte-slicing "extractor" that skips any of those
steps mismatches the oracle.

Pure stdlib (``email.policy.default`` gives the modern EmailMessage API),
so like the DOCX route there is no import guard.
"""

from __future__ import annotations

import email
import email.policy
from email.message import EmailMessage


def extract_eml(payload: bytes) -> tuple:
    """Parse one message -> (subject, body, n_parts).

    subject: RFC 2047 decoded; body: the text/plain body with its
    transfer encoding decoded (multipart/alternative prefers the plain
    part); n_parts: MIME parts walked (container included)."""
    msg = email.message_from_bytes(bytes(payload), policy=email.policy.default)
    subject = str(msg["Subject"] or "")
    part = msg.get_body(preferencelist=("plain",))
    body = part.get_content() if part is not None else ""
    n_parts = sum(1 for _ in msg.walk())
    return subject, body, n_parts


# --------------------------------------------------------- synthesizers


def _subject(doc_id: int) -> str:
    # Non-ASCII (en dash) forces RFC 2047 encoding on serialization.
    return f"Re: doc {doc_id} – update"


def build_eml(doc_id: int, text: str) -> bytes:
    """Deterministic MIME message for ``doc_id``: even ids are
    multipart/alternative (quoted-printable plain part + an HTML part the
    extractor must NOT prefer), odd ids are single-part base64 text/plain.
    The plain body is exactly ``text`` (set_content appends the final
    newline, the python-docx-style +chr(10) contract)."""
    msg = EmailMessage(policy=email.policy.default)
    msg["From"] = f"crawler{doc_id}@example.org"
    msg["To"] = "archive@example.org"
    msg["Date"] = "Mon, 01 Jan 2024 00:00:00 +0000"
    msg["Subject"] = _subject(doc_id)
    if doc_id % 2 == 0:
        msg.set_content(text, cte="quoted-printable")
        msg.add_alternative(
            f"<html><body><p>{text[:20]}</p></body></html>", subtype="html"
        )
        msg.set_boundary(f"==b{doc_id}==")
    else:
        msg.set_content(text, cte="base64")
    return msg.as_bytes()
