package graft.util

import org.apache.hadoop.conf.Configuration

import java.io.{ObjectInputStream, ObjectOutputStream}

/** Hadoop `Configuration` is not `java.io.Serializable`; this minimal
  * wrapper ships one to tasks (via the public Hadoop `write`/`readFields`
  * API) so distributed code can open the table's filesystem with the
  * driver's exact configuration — credentials, endpoints — instead of a
  * default-constructed one.
  */
class SerializableHadoopConf(@transient private var conf: Configuration)
    extends Serializable {

  def value: Configuration = conf

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}
