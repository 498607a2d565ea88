"""Leveled logging (Verbose::PrintMess equivalent, System.h:44-69)."""

from __future__ import annotations

import sys

QUIET = 0
NORMAL = 1
VERBOSE = 2
VERY_VERBOSE = 3
DEBUG = 4

_level = QUIET


def set_level(level: int):
    global _level
    _level = level


def print_mess(msg: str, level: int = NORMAL):
    if level <= _level:
        print(msg, file=sys.stderr)
