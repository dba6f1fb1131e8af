package minicat;

import java.util.ArrayList;
import java.util.Iterator;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.read.SupportsPushDownFilters;
import org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns;
import org.apache.spark.sql.sources.EqualTo;
import org.apache.spark.sql.sources.Filter;
import org.apache.spark.sql.sources.GreaterThan;
import org.apache.spark.sql.sources.GreaterThanOrEqual;
import org.apache.spark.sql.sources.LessThan;
import org.apache.spark.sql.sources.LessThanOrEqual;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.StringType;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.unsafe.types.UTF8String;

/**
 * Group-per-partition scan (r4): one input partition per storage group —
 * the in-memory analog of one Iceberg data file per scan task — over a
 * consistent snapshot of the group lists (current, or a pinned
 * {@code VERSION AS OF} snapshot). Supports column pruning and the
 * {@code _group} metadata column (the group id, Iceberg's {@code _file}
 * analog), which the runtime group-filtering rule uses to prune MERGE
 * rewrites to matched groups only.
 */
public class MiniScan
    implements ScanBuilder, Scan, Batch, SupportsPushDownRequiredColumns,
        SupportsPushDownFilters {
  protected final String key;
  protected final StructType tableSchema;
  protected final Long snapshotId;
  private StructType readSchema;
  // precomputed (column index, internal comparison value, filter) triples —
  // boundOf runs once per filter at pushdown, not per (group, filter) pair
  private ArrayList<Object[]> skipBounds = new ArrayList<>();

  MiniScan(String key, StructType tableSchema, Long snapshotId) {
    this.key = key;
    this.tableSchema = tableSchema;
    this.snapshotId = snapshotId;
    this.readSchema = tableSchema;
  }

  @Override
  public void pruneColumns(StructType requiredSchema) {
    this.readSchema = requiredSchema;
  }

  /** Row-level scans must NOT stats-skip: the commit replaces exactly the
   *  retained groups with the scan's output, so a skipped group's rows
   *  would be lost. Plain reads only (the manifest-pruning analog);
   *  VERSION AS OF reads skip with the SNAPSHOT's own stats (r5). */
  protected boolean statsSkipAllowed() {
    return true;
  }

  @Override
  public Filter[] pushFilters(Filter[] filters) {
    if (statsSkipAllowed()) {
      for (Filter f : filters) {
        Object[] b = boundOf(f);
        if (b != null) {
          skipBounds.add(b);
        }
      }
    }
    // everything stays a residual: skipping prunes GROUPS, rows inside a
    // surviving group still need the predicate evaluated by Spark
    return filters;
  }

  @Override
  public Filter[] pushedFilters() {
    Filter[] out = new Filter[skipBounds.size()];
    for (int i = 0; i < out.length; i++) {
      out[i] = (Filter) skipBounds.get(i)[2];
    }
    return out;
  }

  /** (column index, comparison value, op) of a supported simple filter, or
   *  null when min/max skipping cannot use it. */
  private Object[] boundOf(Filter f) {
    String col;
    Object val;
    if (f instanceof EqualTo) {
      col = ((EqualTo) f).attribute();
      val = ((EqualTo) f).value();
    } else if (f instanceof GreaterThan) {
      col = ((GreaterThan) f).attribute();
      val = ((GreaterThan) f).value();
    } else if (f instanceof GreaterThanOrEqual) {
      col = ((GreaterThanOrEqual) f).attribute();
      val = ((GreaterThanOrEqual) f).value();
    } else if (f instanceof LessThan) {
      col = ((LessThan) f).attribute();
      val = ((LessThan) f).value();
    } else if (f instanceof LessThanOrEqual) {
      col = ((LessThanOrEqual) f).attribute();
      val = ((LessThanOrEqual) f).value();
    } else {
      return null;
    }
    if (val == null || col.equals(MiniTable.GROUP_COL)
        || !java.util.Arrays.asList(tableSchema.fieldNames()).contains(col)) {
      return null;
    }
    int idx = tableSchema.fieldIndex(col);
    DataType t = tableSchema.fields()[idx].dataType();
    if (t instanceof StringType) {
      val = UTF8String.fromString(val.toString());
    } else if (val instanceof java.sql.Timestamp) {
      java.sql.Timestamp ts = (java.sql.Timestamp) val;
      val = ts.getTime() * 1000L + (ts.getNanos() % 1_000_000) / 1000;
    } else if (val instanceof java.time.Instant) {
      java.time.Instant in = (java.time.Instant) val;
      val = in.getEpochSecond() * 1_000_000L + in.getNano() / 1000;
    }
    if (!(val instanceof Comparable)) {
      return null;
    }
    return new Object[] {idx, val, f};
  }

  /** min/max refutation: can any row of a group with stats {@code st}
   *  satisfy the precomputed bound {@code b}? Unknown/missing/mistyped
   *  stats -> true (scan it). */
  @SuppressWarnings({"unchecked", "rawtypes"})
  private static boolean groupCanMatch(Object[] st, Object[] b) {
    if (st == null || b == null) {
      return true;
    }
    Filter f = (Filter) b[2];
    int idx = (Integer) b[0];
    if (2 * idx + 1 >= st.length) {
      return true;
    }
    Object mn = st[2 * idx];
    Object mx = st[2 * idx + 1];
    Comparable v = (Comparable) b[1];
    if (mn == null || mx == null || mn.getClass() != v.getClass()) {
      return true;
    }
    if (f instanceof EqualTo) {
      return v.compareTo(mn) >= 0 && v.compareTo(mx) <= 0;
    }
    if (f instanceof GreaterThan) {
      return v.compareTo(mx) < 0;
    }
    if (f instanceof GreaterThanOrEqual) {
      return v.compareTo(mx) <= 0;
    }
    if (f instanceof LessThan) {
      return v.compareTo(mn) > 0;
    }
    if (f instanceof LessThanOrEqual) {
      return v.compareTo(mn) >= 0;
    }
    return true;
  }

  @Override
  public Scan build() {
    return this;
  }

  @Override
  public StructType readSchema() {
    return readSchema;
  }

  @Override
  public Batch toBatch() {
    return this;
  }

  /** Row-level subclass narrows this after runtime group filtering. */
  protected boolean groupRetained(int g) {
    return true;
  }

  @Override
  public InputPartition[] planInputPartitions() {
    // projection: read-schema field -> STORAGE SLOT (via the r7 column
    // map of this scan's schema epoch), or -1 = _group
    StructField[] fields = readSchema.fields();
    int[] colMap = MiniStore.colMapAt(key, snapshotId);
    int[] srcIdx = new int[fields.length];
    DataType[] types = new DataType[fields.length];
    for (int i = 0; i < fields.length; i++) {
      if (fields[i].name().equals(MiniTable.GROUP_COL)) {
        srcIdx[i] = -1;
      } else {
        int fi = tableSchema.fieldIndex(fields[i].name());
        srcIdx[i] = colMap[fi];
        types[i] = tableSchema.fields()[fi].dataType();
      }
    }
    ArrayList<ArrayList<InternalRow>> groups;
    Object[][] stats;
    if (!skipBounds.isEmpty() && statsSkipAllowed()) {
      // one lock for rows AND stats: separately-fetched stats could
      // describe a newer commit and wrongly refute captured rows
      Object[] pair = MiniStore.groupsWithStats(key, snapshotId);
      groups = (ArrayList<ArrayList<InternalRow>>) pair[0];
      stats = (Object[][]) pair[1];
    } else {
      groups = MiniStore.groupsAt(key, snapshotId);
      stats = null;
    }
    ArrayList<InputPartition> parts = new ArrayList<>();
    for (int g = 0; g < MiniStore.NUM_GROUPS; g++) {
      if (!groupRetained(g) || groups.get(g).isEmpty()) {
        continue;
      }
      boolean canMatch = true;
      if (stats != null) {
        for (Object[] b : skipBounds) {
          if (!groupCanMatch(stats[g], b)) {
            canMatch = false; // manifest min/max refutes: skip the group
            break;
          }
        }
      }
      if (canMatch) {
        parts.add(new MiniInputPartition(g, groups.get(g), srcIdx, types));
      }
    }
    return parts.toArray(new InputPartition[0]);
  }

  @Override
  public PartitionReaderFactory createReaderFactory() {
    return new MiniReaderFactory();
  }

  static class MiniInputPartition implements InputPartition {
    final int groupId;
    final ArrayList<InternalRow> rows;
    final int[] srcIdx;
    final DataType[] types;

    MiniInputPartition(int groupId, ArrayList<InternalRow> rows, int[] srcIdx, DataType[] types) {
      this.groupId = groupId;
      this.rows = rows;
      this.srcIdx = srcIdx;
      this.types = types;
    }
  }

  static class MiniReaderFactory implements PartitionReaderFactory {
    @Override
    public PartitionReader<InternalRow> createReader(InputPartition partition) {
      final MiniInputPartition p = (MiniInputPartition) partition;
      final Iterator<InternalRow> it = p.rows.iterator();
      return new PartitionReader<InternalRow>() {
        private InternalRow current;

        @Override
        public boolean next() {
          if (it.hasNext()) {
            InternalRow full = it.next();
            Object[] vals = new Object[p.srcIdx.length];
            for (int i = 0; i < p.srcIdx.length; i++) {
              if (p.srcIdx[i] < 0) {
                vals[i] = p.groupId;
              } else if (p.srcIdx[i] >= full.numFields()) {
                // row written before an ALTER TABLE ADD COLUMN: null-pad
                vals[i] = null;
              } else {
                vals[i] = full.isNullAt(p.srcIdx[i]) ? null : full.get(p.srcIdx[i], p.types[i]);
              }
            }
            current = new GenericInternalRow(vals);
            return true;
          }
          return false;
        }

        @Override
        public InternalRow get() {
          return current;
        }

        @Override
        public void close() {}
      };
    }
  }
}
