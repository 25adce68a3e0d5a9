from .sample_pdf import sample_pdf, searchsorted_right

__all__ = ["sample_pdf", "searchsorted_right"]
