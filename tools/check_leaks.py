#!/usr/bin/env python3
"""Reproducible leak scanner (round-5 ADVICE: the LEAKCHECK artifact
must be regenerable, not a hand-bumped round field).

Scans every tracked source/config/doc file in the repo for the seven
LEAKCHECK categories and prints the same JSON shape the driver
records. Everything in this repo must derive from public knowledge
only, so the scanner is allowlist-based: imports outside the public
namespaces, URLs outside public hosts, cloud bucket URIs, chat/short
links, credential-shaped strings, and environment variables outside
the repo's own SPARK_GRAFT_* contract are all hits.

Usage: python3 tools/check_leaks.py [--round N] [rootDir]
The scanned file list and the command line are embedded in the
artifact so a 0-hit result is verifiable.
"""
import json
import re
import subprocess
import sys

PUBLIC_IMPORTS = re.compile(
    r"^\s*import\s+(?!(?:org\.apache\.|scala\.|java\.|javax\.|graft\.|"
    r"org\.scalatest|org\.scalacheck|org\.slf4j|com\.fasterxml\.jackson))"
    # only domain-rooted paths are package imports; a lowercase local
    # value root (import spark.implicits._) is instance member access
    r"(?:org|com|net|io|ai|co|us|dev|internal|corp)\."
)
PUBLIC_HOSTS = (
    "apache.org", "github.com", "scala-lang.org", "scalatest.org",
    "w3.org", "example.com", "localhost", "arxiv.org", "acm.org",
    "duckdb.org", "wikipedia.org", "openjdk.org", "maven.org",
)
URL = re.compile(r"https?://([A-Za-z0-9.-]+)")
# "s3://bucket/key" is SURVEY.md's placeholder citation of the
# reference's hand-rolled S3 reads, not a real bucket name
BUCKET = re.compile(r"\b(?:s3a?|gs|wasbs?|abfss?)://(?!bucket/)[A-Za-z0-9._/-]+")
SLACK = re.compile(r"slack\.com/archives|(?<![\w/])go/[a-z][\w-]{2,}")
API_KEY = re.compile(
    r"(?:sk-[A-Za-z0-9]{16,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{20,}|"
    r"xox[baprs]-[A-Za-z0-9-]{10,})"
)
# env vars read by the code must be the repo's own contract
ENV_OK = re.compile(r"^(SPARK_\w+|GRAFT_\w+|HOME|PATH|TMPDIR|USER)$")
# Scala sys.env reads AND Python os.environ / os.getenv reads
ENV_READ = re.compile(
    r'sys\.env(?:\.get(?:OrElse)?)?\(\s*"([^"]+)"'
    r'|os\.environ(?:\.get)?\s*[\[(]\s*["\']([^"\']+)["\']'
    r'|os\.getenv\(\s*["\']([^"\']+)["\']')
# second-level package roots that are neither public libs nor this repo
PKG2 = re.compile(r"^\s*package\s+(?!graft\b)(\w+)\.(\w+)")

SCAN_SUFFIXES = (".scala", ".sbt", ".py", ".md", ".json", ".properties")
SKIP = ("LEAKCHECK.json", "COPYCHECK.json", "PAPERS.md", "SNIPPETS.md",
        "BENCH_", "CORRECTNESS_", "bench_", "VERDICT.md", "ADVICE.md")


def main():
    argv = sys.argv[1:]
    rnd = 0
    if "--round" in argv:
        i = argv.index("--round")
        rnd = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    root = argv[0] if argv else "."
    files = subprocess.run(["git", "-C", root, "ls-files"],
                           capture_output=True, text=True,
                           check=True).stdout.splitlines()
    files = [f for f in files if f.endswith(SCAN_SUFFIXES)
             and not any(s in f for s in SKIP)]
    hits = {k: [] for k in ["internal-import", "internal-url",
                            "internal-pkg2", "internal-bucket",
                            "slack-link", "api-key", "axon-env"]}
    for f in files:
        text = open(f"{root}/{f}", encoding="utf-8",
                    errors="replace").read()
        for i, line in enumerate(text.splitlines(), 1):
            where = f"{f}:{i}"
            if f.endswith((".scala", ".sbt")) and PUBLIC_IMPORTS.search(line):
                hits["internal-import"].append(where)
            for m in URL.finditer(line):
                host = m.group(1).lower()
                if not any(host == h or host.endswith("." + h)
                           for h in PUBLIC_HOSTS):
                    hits["internal-url"].append(where)
            if f.endswith((".scala", ".sbt")) and PKG2.search(line):
                hits["internal-pkg2"].append(where)
            if BUCKET.search(line):
                hits["internal-bucket"].append(where)
            if SLACK.search(line):
                hits["slack-link"].append(where)
            if API_KEY.search(line):
                hits["api-key"].append(where)
            for m in ENV_READ.finditer(line):
                name = next(g for g in m.groups() if g is not None)
                if not ENV_OK.match(name):
                    hits["axon-env"].append(where)
    out = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "command": "python3 tools/check_leaks.py --round %d" % rnd,
        "n_files_scanned": len(files),
    }
    print(json.dumps(out, indent=2))
    sys.exit(1 if out["n_hits"] else 0)


if __name__ == "__main__":
    main()
