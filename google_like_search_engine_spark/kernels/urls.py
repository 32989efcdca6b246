"""URL parsing / normalization / anchor extraction kernels.

Ports of the reference's link-graph plumbing (/root/reference):
- ``parse_url``          <- tools/URLParser.java:8-31
- ``normalize_urls``     <- jobs/PageRank.java:29-66 (incl. its stateful
                            ``basePath`` mutation across a list — the
                            variant that feeds the PageRank link graph)
- ``should_include_url`` <- jobs/PageRank.java:95-113
- ``extract_links``      <- jobs/PageRank.java:68-92 (extractUrlsAndTexts
                            keyset: per-page deduped, normalized,
                            filtered outlink list)
"""

from __future__ import annotations

import re

ANCHOR_RE = re.compile(
    r'<a\s+(?:[^>]*?\s+)?href="([^"]*)"[^>]*>(.*?)</a>',
    re.IGNORECASE | re.DOTALL,
)

_SUPPORTED_PROTOCOLS = frozenset({"http", "https"})
_UNSUPPORTED_EXTENSIONS = (".jpg", ".jpeg", ".gif", ".png", ".txt")


def parse_url(url: str) -> list:
    """Split into [protocol, host, port, path]; missing parts are None.

    Statement-for-statement port of tools/URLParser.java (its edge-case
    behavior differs from urllib: e.g. the protocol is everything before
    ``//`` minus one char, and a missing path becomes "/")."""
    result: list = [None, None, None, None]
    slashslash = url.find("//")
    if slashslash > 0:
        result[0] = url[: slashslash - 1]
        nextslash = url.find("/", slashslash + 2)
        if nextslash >= 0:
            result[1] = url[slashslash + 2 : nextslash]
            result[3] = url[nextslash:]
        else:
            result[1] = url[slashslash + 2 :]
            result[3] = "/"
        colon_pos = result[1].find(":")
        if colon_pos > 0:
            result[2] = result[1][colon_pos + 1 :]
            result[1] = result[1][:colon_pos]
    else:
        result[3] = url
    return result


def normalize_urls(urls: list, base_url: str) -> list:
    """Resolve raw hrefs against ``base_url`` (PageRank.java:29-66).

    Reproduces the reference quirks exactly: default port 80/443 by
    protocol, ``#`` fragment strip, ``../`` chain resolution, and the
    *stateful* ``basePath`` variable that is mutated across iterations
    of the input list (PageRank.java:50-59) — callers that need
    independent resolution pass singleton lists, as the reference does
    in extractUrlsAndTexts (PageRank.java:84)."""
    normalized = []
    base_parts = parse_url(base_url)
    base_protocol = base_parts[0]
    base_path = base_parts[3]

    for raw in urls:
        raw_parts = parse_url(raw)
        protocol = raw_parts[0] if raw_parts[0] else base_protocol
        host = raw_parts[1] if raw_parts[1] else base_parts[1]
        port = raw_parts[2] if raw_parts[2] else ("443" if protocol == "https" else "80")
        path = raw_parts[3] if raw_parts[3] is not None else ""

        hash_index = path.find("#")
        if hash_index >= 0:
            path = path[:hash_index]

        if path.startswith("/"):
            base_path = ""
        elif path.startswith("../"):
            while path.startswith("../"):
                path = path[3:]
                # Java lastIndexOf("/", fromIndex) searches backwards
                # from fromIndex inclusive; rfind's `end` is exclusive.
                cut = base_path.rfind("/", 0, max(len(base_path) - 1, 0))
                base_path = base_path[: cut + 1]
        elif path and not path.startswith("#"):
            base_path = base_path[: base_path.rfind("/") + 1]

        port_part = "" if port == "" else ":" + str(port)
        normalized.append(f"{protocol}://{host}{port_part}{base_path}{path}")
    return normalized


def should_include_url(url: str) -> bool:
    """Protocol/extension filter (PageRank.java:95-113)."""
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/]*)(/[^?#]*)?", url)
    if not m:
        return False
    if m.group(1).lower() not in _SUPPORTED_PROTOCOLS:
        return False
    path = (m.group(3) or "").lower()
    return not path.endswith(_UNSUPPORTED_EXTENSIONS)


def extract_links(content: str, base_url: str) -> list:
    """Per-page deduped, normalized, filtered outlinks in first-seen
    order (PageRank.java:68-92 keyset semantics: dedupe raw hrefs,
    normalize each independently, drop non-http(s)/image targets).

    The reference iterates a HashMap (unspecified order); we fix
    first-occurrence order, which is deterministic and a superset
    guarantee — consumers treat the result as a set."""
    seen_raw = {}
    for m in ANCHOR_RE.finditer(content):
        seen_raw.setdefault(m.group(1), True)
    out: dict = {}
    for raw in seen_raw:
        norm = normalize_urls([raw], base_url)[0]
        if should_include_url(norm):
            out.setdefault(norm, True)
    return list(out)
