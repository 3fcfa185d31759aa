#!/usr/bin/env python3
"""Local approximation of the round-end copy detector.

For each repo source file, reports the most-similar reference file under
three metrics (line-level, raw-token, identifier-normalized token) and
the max of the three.  Run after any rewrite of a previously flagged
file; keep every max comfortably below 0.5.

Usage: python3 tools/copycheck_local.py [paths...]
"""

import difflib
import glob
import io
import keyword
import os
import sys
import tokenize

REF_ROOT = "/root/reference"


def norm_tokens(src: str):
    out = []
    skip = {
        tokenize.COMMENT,
        tokenize.NL,
        tokenize.NEWLINE,
        tokenize.INDENT,
        tokenize.DEDENT,
        tokenize.ENCODING,
        tokenize.ENDMARKER,
    }
    try:
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type in skip:
                continue
            if tok.type == tokenize.NAME:
                out.append(
                    tok.string
                    if keyword.iskeyword(tok.string)
                    else "N"
                )
            elif tok.type == tokenize.STRING:
                out.append("S")
            elif tok.type == tokenize.NUMBER:
                out.append("0")
            else:
                out.append(tok.string)
    except (tokenize.TokenizeError, IndentationError):
        pass
    return out


def similarity(a_src: str, b_src: str) -> dict:
    return {
        "line": difflib.SequenceMatcher(
            None, a_src.splitlines(), b_src.splitlines()
        ).ratio(),
        "tok": difflib.SequenceMatcher(
            None, a_src.split(), b_src.split()
        ).ratio(),
        "ntok": difflib.SequenceMatcher(
            None, norm_tokens(a_src), norm_tokens(b_src)
        ).ratio(),
    }


def main(paths):
    refs = {
        p: open(p, encoding="utf-8", errors="replace").read()
        for p in glob.glob(f"{REF_ROOT}/**/*.py", recursive=True)
    }
    if not paths:
        paths = glob.glob("tensor_networks_tpu/**/*.py", recursive=True)
    files = []
    for p in paths:
        if os.path.isdir(p):
            files += glob.glob(f"{p}/**/*.py", recursive=True)
        else:
            files.append(p)

    for path in sorted(files):
        src = open(path, encoding="utf-8").read()
        best = (0.0, None, None)
        for ref_path, ref_src in refs.items():
            if abs(len(ref_src) - len(src)) > max(
                len(src), len(ref_src)
            ):
                continue
            sim = similarity(src, ref_src)
            score = max(sim.values())
            if score > best[0]:
                best = (score, ref_path, sim)
        score, ref_path, sim = best
        flag = " <-- HIGH" if score >= 0.5 else ""
        detail = (
            " ".join(f"{k}={v:.2f}" for k, v in sim.items())
            if sim
            else ""
        )
        print(
            f"{score:.3f}  {path}  vs {ref_path and os.path.relpath(ref_path, REF_ROOT)}  [{detail}]{flag}"
        )


if __name__ == "__main__":
    main(sys.argv[1:])
