package minicat;

import java.util.ArrayList;
import java.util.List;
import java.util.Map;
import java.util.concurrent.ConcurrentHashMap;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.types.StructType;

/**
 * Single-JVM table store backing {@link MiniCatalog}.
 *
 * Driver and executors share one JVM in local mode, so a static map is a
 * valid (test-only) storage engine — the point of MiniCatalog is to give
 * Spark's row-level-operation planner (MERGE INTO / UPDATE / DELETE) a real
 * DSv2 surface to execute against in a sandbox with no Iceberg runtime jar.
 * It deliberately mirrors the shape of Spark's own in-memory test catalog
 * (a public pattern; see Spark's InMemoryRowLevelOperationTable docs) while
 * staying minimal: full-table groups, append or replace commits.
 */
public final class MiniStore {
  public static final class Entry {
    public final StructType schema;
    public final List<InternalRow> rows = new ArrayList<>();

    Entry(StructType schema) {
      this.schema = schema;
    }
  }

  private static final Map<String, Entry> TABLES = new ConcurrentHashMap<>();

  private MiniStore() {}

  static Entry create(String key, StructType schema) {
    return TABLES.putIfAbsent(key, new Entry(schema)) == null ? TABLES.get(key) : null;
  }

  static Entry get(String key) {
    return TABLES.get(key);
  }

  static boolean drop(String key) {
    return TABLES.remove(key) != null;
  }

  /** ADVICE r3 #5: a scan planned after dropTable must fail with a clear
   *  message, not an opaque NPE. */
  private static Entry require(String key) {
    Entry e = TABLES.get(key);
    if (e == null) {
      throw new IllegalStateException("table dropped: " + key);
    }
    return e;
  }

  static ArrayList<InternalRow> snapshot(String key) {
    Entry e = require(key);
    synchronized (e.rows) {
      return new ArrayList<>(e.rows);
    }
  }

  static void append(String key, List<InternalRow> rows) {
    Entry e = require(key);
    synchronized (e.rows) {
      e.rows.addAll(rows);
    }
  }

  static void replace(String key, List<InternalRow> rows) {
    Entry e = require(key);
    synchronized (e.rows) {
      e.rows.clear();
      e.rows.addAll(rows);
    }
  }
}
