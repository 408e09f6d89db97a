"""Thin YAML/JSON read/write wrappers.

Parity: src/utils/yaml_helper.py:4-12 and src/utils/json_helper.py:4-11.
Unlike the reference (hard-coded absolute Windows paths at every entry
point), all paths here are caller-supplied.
"""

from __future__ import annotations

import json
from pathlib import Path

import yaml


def yaml_reader(path):
    with open(path) as f:
        return yaml.safe_load(f)


def yaml_writer(path, data) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(data, f)


def json_reader(path):
    with open(path) as f:
        return json.load(f)


def json_writer(data, path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False, indent=4)
