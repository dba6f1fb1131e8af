package minicat;

import org.apache.spark.sql.connector.expressions.Expressions;
import org.apache.spark.sql.connector.expressions.NamedReference;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.RowLevelOperation;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

/**
 * Group-based row-level operation, group-SCOPED since r4 (VERDICT r3 #2):
 * declaring {@code _group} as a required metadata attribute makes Spark
 * carry the group id through the ReplaceData plan and enables the runtime
 * group-filtering rule; the scan instance is shared with the write builder
 * so the commit replaces exactly the groups the (runtime-filtered) scan
 * read — Iceberg-faithful copy-on-write, instead of the r3 behavior where
 * every MERGE rewrote the whole table. Maps the reference's
 * rerun-overwrites behavior (SURVEY.md §2.3 J4).
 */
public class MiniRowLevelOperation implements RowLevelOperation {
  private final String key;
  private final StructType tableSchema;
  private final Command cmd;
  private MiniRowLevelScan scan;

  MiniRowLevelOperation(String key, StructType tableSchema, Command cmd) {
    this.key = key;
    this.tableSchema = tableSchema;
    this.cmd = cmd;
  }

  @Override
  public Command command() {
    return cmd;
  }

  @Override
  public NamedReference[] requiredMetadataAttributes() {
    return new NamedReference[] {Expressions.column(MiniTable.GROUP_COL)};
  }

  @Override
  public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
    scan = new MiniRowLevelScan(key, tableSchema);
    return scan;
  }

  @Override
  public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
    final MiniRowLevelScan s = scan;
    return new MiniWriteBuilder(
        key, tableSchema, info.schema(), true, () -> s == null ? null : s.retainedGroups());
  }
}
