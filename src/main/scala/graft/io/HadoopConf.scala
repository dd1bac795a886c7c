package graft.io

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Serializable wrapper for the Hadoop `Configuration`, which is not
  * `java.io.Serializable` itself — ships the driver's filesystem config
  * (credentials, fs implementations) into write tasks. Same role as
  * Spark's internal `SerializableConfiguration` (private[spark]).
  */
final class HadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
