#!/usr/bin/env python
"""GPT scoring of Visual-CoT answers vs ground truth.

Replacement for reference scripts/visual_cot/gpt_eval_cot_score.py
(:12-60): sends (question, GT, answer) triplets to an OpenAI-compatible
endpoint, records 0..1 scores.  Network use is entirely optional -- in
air-gapped environments use ``--heuristic`` for a token-overlap F1 proxy.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import re
import time

BASE_PROMPT = (
    "You are responsible for proofreading the answers, you need to give a "
    "score to the model's answer by referring to the standard answer, based "
    "on the given question. The full score is 1 point and the minimum score "
    "is 0 points. Please output the score in the form \"score: <score>\". "
    "The evaluation criteria require that the closer the model's answer is "
    "to the standard answer, the higher the score."
)


def heuristic_score(gt: str, answer: str) -> float:
    """Token-overlap F1 (offline proxy for the GPT judge)."""
    tok = lambda s: re.findall(r"[a-z0-9]+", s.lower())
    g, a = set(tok(gt)), set(tok(answer))
    if not g or not a:
        return 0.0
    inter = len(g & a)
    p, r = inter / len(a), inter / len(g)
    return 0.0 if p + r == 0 else 2 * p * r / (p + r)


def gpt_score(question, gt, answer, model, api_base, api_key) -> float:
    import urllib.request

    content = (f"{BASE_PROMPT}\nquestion: {question}\n"
               f"standard answer: {gt}\nmodel's answer: {answer}")
    req = urllib.request.Request(
        f"{api_base}/chat/completions",
        data=json.dumps({
            "model": model,
            "messages": [{"role": "user", "content": content}],
            "temperature": 0.0,
        }).encode(),
        headers={"Authorization": f"Bearer {api_key}",
                 "Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        text = json.load(resp)["choices"][0]["message"]["content"]
    m = re.search(r"score[:\s]*([01](?:\.\d+)?)", text, re.I)
    return float(m.group(1)) if m else 0.0


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--results-dir", required=True)
    p.add_argument("--heuristic", action="store_true",
                   help="offline token-F1 scoring instead of GPT")
    p.add_argument("--model", default="gpt-3.5-turbo")
    p.add_argument("--api-base", default="https://api.openai.com/v1")
    args = p.parse_args()

    api_key = os.environ.get("OPENAI_API_KEY", "")
    summary = {}
    for f in sorted(pathlib.Path(args.results_dir).glob("*.json")):
        if f.name.endswith(".scores.json"):
            continue
        items = json.loads(f.read_text())
        scores = []
        for it in items:
            if args.heuristic:
                s = heuristic_score(it["gt"], it["answer"])
            else:
                s = gpt_score(it["question"], it["gt"], it["answer"],
                              args.model, args.api_base, api_key)
                time.sleep(0.2)
            scores.append(s)
        avg = sum(scores) / max(1, len(scores))
        summary[f.stem] = avg
        (f.parent / f"{f.stem}.scores.json").write_text(json.dumps(scores))
        print(f"{f.stem}: {avg:.4f} ({len(scores)} items)")
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
