from knowledgebot_spark.sources.synthetic import SyntheticDocsDataSource

__all__ = ["SyntheticDocsDataSource"]
