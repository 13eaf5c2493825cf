// JNA mapping of libaprilasr_tpu (native/april_tpu_api.h).
//
// Binding parity with the reference's Java/JNA binding (reference:
// bindings/java/lib/ — same role, written fresh against this framework's
// TCP client library; aam_create_model takes a "host:port" endpoint of a
// running april-serve, not a .april file path).

package aprilasr;

import com.sun.jna.Callback;
import com.sun.jna.Library;
import com.sun.jna.Native;
import com.sun.jna.Pointer;
import com.sun.jna.Structure;

import java.util.Arrays;
import java.util.List;

public interface AprilTpuLibrary extends Library {
    AprilTpuLibrary INSTANCE = Native.load("aprilasr_tpu", AprilTpuLibrary.class);

    int APRIL_VERSION = 1;

    int APRIL_RESULT_RECOGNITION_PARTIAL = 1;
    int APRIL_RESULT_RECOGNITION_FINAL = 2;
    int APRIL_RESULT_ERROR_CANT_KEEP_UP = 3;
    int APRIL_RESULT_SILENCE = 4;

    int APRIL_TOKEN_FLAG_WORD_BOUNDARY_BIT = 1;
    int APRIL_TOKEN_FLAG_SENTENCE_END_BIT = 2;

    int APRIL_CONFIG_FLAG_ASYNC_RT_BIT = 1;
    int APRIL_CONFIG_FLAG_ASYNC_NO_RT_BIT = 2;

    @Structure.FieldOrder({"token", "logprob", "flags", "timeMs", "reserved"})
    class NativeToken extends Structure {
        public Pointer token;
        public float logprob;
        public int flags;
        public long timeMs;      // size_t on 64-bit targets
        public Pointer reserved;

        public NativeToken(Pointer p) {
            super(p);
            read();
        }

        public NativeToken() {}
    }

    interface ResultHandler extends Callback {
        void invoke(Pointer userdata, int resultType, long count, Pointer tokens);
    }

    @Structure.FieldOrder({"speaker", "handler", "userdata", "flags"})
    class NativeConfig extends Structure {
        public byte[] speaker = new byte[16];
        public ResultHandler handler;
        public Pointer userdata;
        public int flags;

        public static class ByValue extends NativeConfig
                implements Structure.ByValue {}

        @Override
        protected List<String> getFieldOrder() {
            return Arrays.asList("speaker", "handler", "userdata", "flags");
        }
    }

    void aam_api_init(int version);

    Pointer aam_create_model(String endpoint);

    String aam_get_name(Pointer model);

    String aam_get_description(Pointer model);

    String aam_get_language(Pointer model);

    long aam_get_sample_rate(Pointer model);

    void aam_free(Pointer model);

    Pointer aas_create_session(Pointer model, NativeConfig.ByValue config);

    void aas_feed_pcm16(Pointer session, short[] pcm16, long count);

    void aas_flush(Pointer session);

    float aas_realtime_get_speedup(Pointer session);

    void aas_free(Pointer session);
}
