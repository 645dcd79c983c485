from . import form_schemas, jsonl_source, kobo, pds, sheets

__all__ = ["form_schemas", "jsonl_source", "kobo", "pds", "sheets"]
