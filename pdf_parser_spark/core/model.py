"""Shared in-memory shapes for the core extraction library.

One document == one row; its pages/tables stay nested inside the row
(SURVEY.md §1.1).  Table = ragged list[rows][cells] of strings.
"""

from __future__ import annotations

from typing import NamedTuple

Table = list[list[str]]


class Page(NamedTuple):
    page_number: int  # 1-indexed
    text: str
    tables: list[Table]


class Section(NamedTuple):
    name: str
    start_page: int  # 1-indexed inclusive
    end_page: int  # 1-indexed inclusive
    text: str
    tables: list[Table]
