"""vyntr_spark — PySpark-native rebuild of the Vyntr crawl/analytics pipeline.

Blueprint: SURVEY.md. Reference: outpoot/vyntr (read-only, /root/reference).
"""

__version__ = "0.1.0"
