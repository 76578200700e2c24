from pdf_extractor_spark.streaming.ingest import stream_extract

__all__ = ["stream_extract"]
