from .pdf import extract_pages, pdf_source, read_binary_docs  # noqa: F401
