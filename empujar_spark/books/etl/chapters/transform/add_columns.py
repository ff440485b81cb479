"""TRANSFORM: Add Columns chapter (reference books/etl/chapters/transform/
addColumns.js:16-32): ensure the derived columns exist before the
transform chapters populate them."""


def chapter_loader(book):
    chapter = book.add_chapter(200, "transform-addColumns")
    warehouse = book.destination

    def ensure_columns():
        for table, col in [
            ("customer", "total_orders"),
            ("customer", "total_spent"),
            ("part", "times_ordered"),
            ("part", "total_revenue"),
        ]:
            if col not in warehouse.column_types(table):
                warehouse.add_column(table, col, [0.0])

    chapter.add_page("addColumns", ensure_columns)
