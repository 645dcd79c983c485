from . import kobo, pds, sheets

__all__ = ["kobo", "pds", "sheets"]
