"""Example books: ports of the reference's orchestration examples
(books/etl, books/simple) onto the Spark-native engine."""
