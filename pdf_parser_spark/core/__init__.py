"""Pure-Python deterministic extraction core (no Spark, no I/O, no clock).

Reimplements the per-document semantics of the reference engine
(/root/reference/sec_parser) as pure functions over in-memory values.
Every public function here is exercised by pytest and then applied over
Arrow record batches by ``pdf_parser_spark.operators.extract``.
"""

from pdf_parser_spark.core.numeric import parse_numeric, is_numeric_cell
from pdf_parser_spark.core.model import Page, Section, Table
from pdf_parser_spark.core.document import extract_document

__all__ = [
    "parse_numeric", "is_numeric_cell", "Page", "Section", "Table",
    "extract_document",
]
