#!/usr/bin/env python3
"""Self-evidencing leak scan: grep src/, tools/, build.sbt for anything
that smells proprietary/internal (imports outside the public stack,
non-public URLs, cloud buckets, chat links, credential literals, internal
env vars) and write a STAMPED LEAKCHECK.json — timestamp + commit hash +
scanned paths — so each round's zero-hit claim says when and against what
tree it was measured (ADVICE r8/r11: a bare zero-hit counter is not
self-evidencing).

Usage: leakcheck.py [repo_root]   (default: parent of this script)
"""
import datetime
import json
import os
import re
import subprocess
import sys

CATEGORIES = {
    # imports outside the public stack this repo is allowed to use
    # (`<session-val>.implicits._` is a local-value import, not a package;
    # applied to Scala/sbt sources only — see SCALA_ONLY)
    "internal-import": re.compile(
        r"^\s*import\s+(?!(scala|java|javax|org\.apache|org\.scalatest"
        r"|org\.scalacheck|graft)\b)(?![\w.]*\.implicits\b)[a-z][\w.]*", re.M),
    # URLs that are not public OSS/doc hosts; a DOTLESS single-label host
    # (http://pic/1) is the fixtures' obviously-fake convention — skip it
    "internal-url": re.compile(
        r"https?://(?!(localhost|127\.0\.0\.1|0\.0\.0\.0|www\.w3\.org"
        r"|spark\.apache\.org|github\.com|arxiv\.org|doi\.org"
        r"|en\.wikipedia\.org|duckdb\.org|repo1\.maven\.org"
        r"|example\.(com|org)|[\w.-]+\.(test|example|invalid|localhost)\b"
        r"|[\w-]+[/\"'\s]))[\w.-]+"),
    # second-level package roots that look like a company namespace
    "internal-pkg2": re.compile(
        r"^\s*package\s+(?!(graft|org\.apache)\b)[a-z][\w.]*\.[a-z]\w*", re.M),
    # cloud storage buckets / warehouse paths
    # (fixture mocks use clearly-fake bucket names; anything else flags)
    "internal-bucket": re.compile(
        r"\b(s3a?|gs|abfss?|wasbs?)://(?!(lake|bucket|example|test)[/-])[\w./-]+"),
    # chat/ticket shortlinks
    "slack-link": re.compile(r"\b(slack\.com/archives|go/[a-z][\w-]{2,}|#[a-z]+-[a-z]+-(feedback|internal))\b"),
    # credential-shaped literals
    "api-key": re.compile(r"\b(sk-[A-Za-z0-9]{16,}|AKIA[0-9A-Z]{16}|xox[bap]-[\w-]{10,})\b"),
    # environment variables beyond the documented public surface
    "env-var": re.compile(
        r"sys\.env\(\"(?!(SPARK_GRAFT_SF_DIR|SPARK_GRAFT_OUT_DIR"
        r"|GRAFT_[A-Z_]+|HOME|PATH|TMPDIR|JAVA_HOME)\b)[A-Z_]+\"\)"),
}

SCAN_EXT = {".scala", ".sbt", ".py", ".sh", ".md"}
SCALA_ONLY = {"internal-import", "internal-pkg2"}
SCAN_PATHS = ["src", "tools", "build.sbt", "project"]


def scan(root):
    hits = {k: [] for k in CATEGORIES}
    for rel in SCAN_PATHS:
        top = os.path.join(root, rel)
        if os.path.isfile(top):
            files = [top]
        else:
            files = [os.path.join(d, f)
                     for d, _, fs in os.walk(top) for f in fs
                     if os.path.splitext(f)[1] in SCAN_EXT]
        for path in files:
            try:
                text = open(path, encoding="utf-8", errors="replace").read()
            except OSError:
                continue
            ext = os.path.splitext(path)[1]
            for cat, rx in CATEGORIES.items():
                if cat in SCALA_ONLY and ext not in (".scala", ".sbt"):
                    continue
                for m in rx.finditer(text):
                    line = text.count("\n", 0, m.start()) + 1
                    hits[cat].append(
                        f"{os.path.relpath(path, root)}:{line}:"
                        f"{m.group(0)[:80]}")
    return hits


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hits = scan(root)
    commit = subprocess.run(
        ["git", "-C", root, "rev-parse", "HEAD"],
        capture_output=True, text=True).stdout.strip() or "unknown"
    out = {
        "ts": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="seconds"),
        "commit": commit,
        "scanned_paths": SCAN_PATHS,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    print(json.dumps(out, indent=2))
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
