package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}
import org.apache.hadoop.conf.Configuration

/** Serializable carrier for a Hadoop [[Configuration]] (which is not
  * [[java.io.Serializable]] itself) so task-side filesystem access — the
  * per-bucket [[graft.sources.KeyBloom]] loads/writes — sees the DRIVER's
  * configuration (credentials, filesystem impls) instead of a bare
  * `new Configuration()` default. Broadcast it once per job; the payload
  * is the written key/value set, typically a few KB.
  */
class SerializableHadoopConf(@transient var value: Configuration)
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
