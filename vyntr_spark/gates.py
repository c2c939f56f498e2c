"""Fetch-outcome classification shared by the sequential oracle and the
Spark engine (single source of truth for the pinned semantics).

Reference semantics re-specified:
  * content-type allowlist checked before the body
    (genesis/src/network.rs:7-12,43-49);
  * 403 = status 403 OR body contains "403 Forbidden"
    (network.rs:52-55, main.rs:367-371);
  * Cloudflare error = body contains "Cloudflare" AND
    "Worker threw exception" (utils.rs:10-12, network.rs:56-63);
  * robots gating is NEW (north rule; absent in the reference) — with the
    default permissive rule set it is a no-op, so reference parity holds.

The synthetic corpus carries the body markers in the auxiliary
``body_marker`` column (FIXTURES.md §1) rather than in ``html``.
"""

from __future__ import annotations

ALLOWED_CONTENT_TYPES = (
    "text/html",
    "application/xhtml+xml",
    "application/xhtml",
    "text/plain",
)

# outcome labels (metrics columns use these names)
MISSING = "missing"          # url not in the pages table (dead link)
SKIPPED_CT = "skipped_ct"    # content-type gate
FAILED = "failed"            # 403 / cloudflare
ROBOTS = "robots_blocked"    # robots disallow prefix (rebuild-only gate)
SUCCESS = "success"


def classify(found: bool, content_type: str | None, status: int | None,
             body_marker: str | None, robots_blocked: bool) -> str:
    """Pinned gate order: robots → missing → content-type → 403 → cloudflare."""
    if robots_blocked:
        return ROBOTS
    if not found:
        return MISSING
    ct = (content_type or "text/html").split(";")[0].strip()
    if ct not in ALLOWED_CONTENT_TYPES:
        return SKIPPED_CT
    if status == 403 or (body_marker is not None and "403 Forbidden" in body_marker):
        return FAILED
    if (
        body_marker is not None
        and "Cloudflare" in body_marker
        and "Worker threw exception" in body_marker
    ):
        return FAILED
    return SUCCESS


def robots_match(path: str, disallow_prefixes: list[str] | None) -> bool:
    if not disallow_prefixes:
        return False
    return any(path.startswith(p) for p in disallow_prefixes)


def url_path(url: str) -> str:
    """Path component of a canonical http(s) URL (query excluded)."""
    rest = url.split("://", 1)[1] if "://" in url else url
    slash = rest.find("/")
    path = rest[slash:] if slash >= 0 else "/"
    return path.split("?", 1)[0]
