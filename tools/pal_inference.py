#!/usr/bin/env python
# The PAL runtime/interface scaffolding (GenericRuntime, PALInterface,
# process_generation_to_code) and the GSM8K few-shot PROMPT are adapted from
# the PAL repository (github.com/reasoning-machines/pal), Copyright (c) 2022
# PAL authors, licensed under the Apache License, Version 2.0
# (http://www.apache.org/licenses/LICENSE-2.0) — the same upstream the
# reference's tools/pal_inference.py adapts (its header :19-34 carries this
# license).  The PROMPT is a behavioral constant: changing it changes the
# evaluated capability.  Distributed on an "AS IS" BASIS, WITHOUT WARRANTIES
# OR CONDITIONS OF ANY KIND, either express or implied.
"""PAL (Program-Aided Language model) inference on GSM8K
(reference ``tools/pal_inference.py``, itself adapted from
github.com/reasoning-machines/pal).

The model writes a python ``solution()`` function for each math question; the
code block is extracted, executed in a scratch namespace under a timeout, and
the returned value is compared against the dataset target.  Results stream to
``<out_dir>/<dataset>.json`` as jsonl rows {question, target, answer, score,
generation}, with ``--append`` continuing a previous run.

TPU-native glue: generation runs ``apis/interface.generate_interactive`` over
a ``SequenceGenerator`` (per-token jitted decode; the eos for chat turns is
``additional_eos_token_id``, reference default 103028 = <eoa>).  This
environment is zero-egress, so the dataset loads from a local jsonl
(``--data``, rows {"question": …, "answer": "... #### N"}), falling back to
``datasets.load_dataset("gsm8k")`` when available.
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import signal
import sys
from dataclasses import asdict
from typing import Any, Dict, List

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class Timeout:
    """SIGALRM-based timeout context (reference uses the same mechanism)."""

    def __init__(self, seconds: float):
        self.seconds = max(1, int(seconds))

    def _handler(self, signum, frame):
        raise TimeoutError(f"code execution exceeded {self.seconds}s")

    def __enter__(self):
        signal.signal(signal.SIGALRM, self._handler)
        signal.alarm(self.seconds)

    def __exit__(self, *exc):
        signal.alarm(0)
        return False


class GenericRuntime:
    """Scratch python namespace the generated program runs in
    (reference ``pal_inference.py:91-117``)."""

    GLOBAL_DICT: dict = {}
    LOCAL_DICT = None
    HEADERS: List = []

    def __init__(self):
        self._global_vars = copy.copy(self.GLOBAL_DICT)
        for c in self.HEADERS:
            self.exec_code(c)

    def exec_code(self, code_piece: str) -> None:
        exec(code_piece, self._global_vars)  # noqa: S102 - that's the point of PAL

    def eval_code(self, expr: str) -> Any:
        return eval(expr, self._global_vars)  # noqa: S307

    def inject(self, var_dict: Dict[str, Any]) -> None:
        self._global_vars.update(var_dict)

    @property
    def answer(self):
        return self._global_vars["answer"]


def process_generation_to_code(gens: str) -> List[str]:
    """Extract the fenced code block (reference :170-176)."""
    if "```python" in gens:
        gens = gens.split("```python")[1].split("```")[0]
    elif "```" in gens:
        gens = gens.split("```")[1].split("```")[0]
    return gens.split("\n")


class PALInterface:
    """Generate -> extract code -> execute -> answer (reference :120-193)."""

    def __init__(self, generator, tokenizer, generation_config,
                 additional_eos_token_id: int = 103028,
                 get_answer_expr: str = "solution()", verbose: bool = False):
        self.runtime = GenericRuntime()
        self.history: List[str] = []
        self.generator = generator
        self.tokenizer = tokenizer
        self.generation_config = generation_config
        self.additional_eos_token_id = additional_eos_token_id
        self.answer_expr = get_answer_expr
        self.verbose = verbose

    def _stream(self, prompt: str):
        from internevo_tpu.apis.interface import generate_interactive

        ids = self.tokenizer.encode(prompt)
        for out_ids in generate_interactive(
                self.generator, ids, self.generation_config,
                additional_eos_token_id=self.additional_eos_token_id):
            yield self.tokenizer.decode(out_ids)

    def generate(self, prompt: str) -> List[str]:
        cur_gen = ""
        for cur_gen in self._stream(prompt):  # keep only the final generation
            continue
        self.history.append(cur_gen)
        return process_generation_to_code(cur_gen)

    def run(self, prompt: str, time_out: float = 100):
        code = self.generate(prompt)
        exec_result = None
        with Timeout(time_out):
            try:
                exec_result = self.execute(code)
            except Exception as e:  # noqa: BLE001 - scored as wrong answer
                if self.verbose:
                    print(e)
        return exec_result

    def execute(self, code: List[str]):
        self.runtime.exec_code("\n".join(code))
        return self.runtime.eval_code(self.answer_expr)

    def clear_history(self):
        self.history = []


# The reference few-shot PAL prompt (:220-262), with the chat special tokens
PROMPT = """<|System|>:You are a helpful assistant which use tools to solve mathematical reasoning questions. The tools you can use are:
PythonExecutor: It can execute Python code. The code must be a function, and the function name must be 'solution'. The example format is as follows:
```python
def solution():
    variable_names_with_real_meaning = func(variable)
    return variable_names_with_real_meaning
```{eos}
<|User|>:Olivia has $23. She bought five bagels for $3 each. How much money does she have left?{eoh}
<|Bot|>:
```python
def solution():
    money_initial = 23
    bagels = 5
    bagel_cost = 3
    money_spent = bagels * bagel_cost
    money_left = money_initial - money_spent
    result = money_left
    return result
```{eoa}
<|User|>:Michael had 58 golf balls. On tuesday, he lost 23 golf balls. On wednesday, he lost 2 more. How many golf balls did he have at the end of wednesday?{eoh}
<|Bot|>:
```python
def solution():
    golf_balls_initial = 58
    golf_balls_lost_tuesday = 23
    golf_balls_lost_wednesday = 2
    golf_balls_left = golf_balls_initial - golf_balls_lost_tuesday - golf_balls_lost_wednesday
    result = golf_balls_left
    return result
```{eoa}
<|User|>:There were nine computers in the server room. Five more computers were installed each day, from monday to thursday. How many computers are now in the server room?{eoh}
<|Bot|>:
```python
def solution():
    computers_initial = 9
    computers_per_day = 5
    num_days = 4  # 4 days between monday and thursday
    computers_added = computers_per_day * num_days
    computers_total = computers_initial + computers_added
    result = computers_total
    return result
```{eoa}
<|System|>:How about this question?{eos}
<|User|>:{question}{eoh}
<|Bot|>:""".strip()


def load_data(args) -> List[dict]:
    """{"question": str, "target": float} rows: local jsonl first (zero-egress
    default), HF datasets when reachable (reference :202-217)."""
    if args.data:
        rows = []
        with open(args.data) as f:
            for line in f:
                if not line.strip():
                    continue
                d = json.loads(line)
                target = float(str(d["answer"]).split("#")[-1].replace(",", ""))
                rows.append({"question": d["question"], "target": target})
        return rows
    if args.dataset != "gsm8k":
        raise NotImplementedError(args.dataset)
    from datasets import load_dataset  # needs network/cache

    test_set = load_dataset(path=args.dataset, name="main")["test"]
    return [{"question": d["question"],
             "target": float(d["answer"].split("#")[-1].replace(",", ""))}
            for d in test_set]


def parse_args():
    parser = argparse.ArgumentParser(description="PAL Inference (TPU-native)")
    parser.add_argument("--config", default="configs/demo.py", help="training config to build the model")
    parser.add_argument("--ckpt", default=None, help="checkpoint dir (orbax tree)")
    parser.add_argument("--tokenizer", default=None, help="HF tokenizer path")
    parser.add_argument("--dataset", default="gsm8k")
    parser.add_argument("--data", default=None, help="local jsonl with {question, answer} rows")
    parser.add_argument("--out_dir", "-o", default="pal_output")
    parser.add_argument("--max_length", type=int, default=2048)
    parser.add_argument("--top_p", type=float, default=0.8)
    parser.add_argument("--temperature", "-t", type=float, default=1.0)
    parser.add_argument("--eoh", default="")
    parser.add_argument("--eoa", default="")
    parser.add_argument("--eos", default="")
    parser.add_argument("--time_out", type=float, default=100)
    parser.add_argument("--verbose", "-v", action="store_true")
    parser.add_argument("--append", "-a", action="store_true")
    return parser.parse_args()


def main():
    from transformers import AutoTokenizer

    from internevo_tpu.apis.interface import GenerationConfig
    from web_demo import build_generator

    args = parse_args()
    generator = build_generator(args.config, args.ckpt)
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer, trust_remote_code=True)
    gc = GenerationConfig(max_length=args.max_length, top_p=args.top_p,
                          temperature=args.temperature, do_sample=args.temperature > 0)
    interface = PALInterface(generator, tokenizer, gc, verbose=args.verbose)

    data = load_data(args)
    os.makedirs(args.out_dir, exist_ok=True)
    out_path = os.path.join(args.out_dir, f"{args.dataset}.json")
    mode = "a" if args.append else "w"
    scores = []
    with open(out_path, mode) as f:
        for i, row in enumerate(data):
            prompt = PROMPT.format(question=row["question"], eoh=args.eoh,
                                   eoa=args.eoa, eos=args.eos)
            answer = interface.run(prompt, time_out=args.time_out)
            try:
                answer = float(answer)
            except (TypeError, ValueError):
                answer = None
            score = int(answer is not None and abs(answer - row["target"]) < 1e-3)
            scores.append(score)
            f.write(json.dumps({"question": row["question"], "target": row["target"],
                                "answer": answer, "score": score,
                                "generation": interface.history[-1]},
                               ensure_ascii=False) + "\n")
            f.flush()
            interface.clear_history()
            if (i + 1) % 10 == 0 or i + 1 == len(data):
                print(f"[{i + 1}/{len(data)}] accuracy={sum(scores) / len(scores):.4f}")
    print(f"done: accuracy={sum(scores) / max(1, len(scores)):.4f} -> {out_path}")


if __name__ == "__main__":
    main()
