// High-level C# API: AprilModel / AprilSession / AprilToken.
//
// Same shape as the reference's C# binding (reference:
// bindings/csharp/nuget/src/AprilModel.cs and AprilSession.cs — re-written
// for this framework's TCP-client library; sessions always deliver results
// on a background reader thread, like the reference's async modes).

using System;
using System.Security.Cryptography;
using System.Text;

namespace AprilAsrTpu
{
    public class AprilToken
    {
        public string Token { get; }
        public float LogProb { get; }
        public AprilTokenFlags Flags { get; }
        public ulong TimeMs { get; }

        internal AprilToken(string token, float logprob, uint flags, ulong timeMs)
        {
            Token = token;
            LogProb = logprob;
            Flags = (AprilTokenFlags)flags;
            TimeMs = timeMs;
        }

        public bool IsWordBoundary => Flags.HasFlag(AprilTokenFlags.WordBoundary);
        public bool IsSentenceEnd => Flags.HasFlag(AprilTokenFlags.SentenceEnd);
    }

    public delegate void RecognitionHandler(AprilResultKind kind, AprilToken[] tokens);

    public class AprilModel : IDisposable
    {
        internal IntPtr Handle;
        private static bool _initialized;

        /// <param name="endpoint">"host:port" of a running april-serve.</param>
        public AprilModel(string endpoint)
        {
            if (!_initialized)
            {
                Native.aam_api_init(Native.AprilVersion);
                _initialized = true;
            }
            Handle = Native.aam_create_model(endpoint);
            if (Handle == IntPtr.Zero)
                throw new InvalidOperationException(
                    $"failed to connect to april-serve at {endpoint}");
        }

        public string Name => Native.PtrToUtf8(Native.aam_get_name(Handle));
        public string Description =>
            Native.PtrToUtf8(Native.aam_get_description(Handle));
        public string Language => Native.PtrToUtf8(Native.aam_get_language(Handle));
        public int SampleRate => (int)Native.aam_get_sample_rate(Handle);

        public void Dispose()
        {
            if (Handle != IntPtr.Zero)
            {
                Native.aam_free(Handle);
                Handle = IntPtr.Zero;
            }
        }
    }

    public class AprilSession : IDisposable
    {
        private IntPtr _handle;
        private readonly RecognitionHandler _handler;
        // Keep the marshalled delegate alive for the session's lifetime —
        // the native library calls it from its reader thread.
        private readonly NativeResultHandler _nativeHandler;

        public AprilSession(AprilModel model, RecognitionHandler handler,
                            bool asynchronous = true, bool noRt = false,
                            string speakerName = "")
        {
            _handler = handler ?? throw new ArgumentNullException(nameof(handler));
            _nativeHandler = OnNativeResult;

            var config = new NativeConfig
            {
                handler = _nativeHandler,
                userdata = IntPtr.Zero,
                flags = asynchronous
                    ? (noRt ? Native.ConfigFlagAsyncNoRt : Native.ConfigFlagAsyncRt)
                    : 0,
                speaker = MakeSpeakerId(speakerName),
            };
            _handle = Native.aas_create_session(model.Handle, config);
            if (_handle == IntPtr.Zero)
                throw new InvalidOperationException("failed to create session");
        }

        private static NativeSpeakerId MakeSpeakerId(string name)
        {
            var id = new NativeSpeakerId { data = new byte[16] };
            if (!string.IsNullOrEmpty(name))
            {
                using var sha = SHA256.Create();
                var digest = sha.ComputeHash(Encoding.UTF8.GetBytes(name));
                Array.Copy(digest, id.data, 16);
            }
            return id;
        }

        private void OnNativeResult(IntPtr userdata, int resultType,
                                    UIntPtr count, IntPtr tokensPtr)
        {
            int n = (int)count;
            var tokens = new AprilToken[n];
            int stride = System.Runtime.InteropServices.Marshal
                .SizeOf<NativeToken>();
            for (int i = 0; i < n; i++)
            {
                var nt = System.Runtime.InteropServices.Marshal
                    .PtrToStructure<NativeToken>(tokensPtr + i * stride);
                tokens[i] = new AprilToken(
                    Native.PtrToUtf8(nt.token), nt.logprob, nt.flags,
                    (ulong)nt.timeMs);
            }
            _handler((AprilResultKind)resultType, tokens);
        }

        /// <summary>Feed 16 kHz mono PCM16 samples.</summary>
        public void FeedPcm16(short[] samples)
        {
            Native.aas_feed_pcm16(_handle, samples, (UIntPtr)samples.Length);
        }

        /// <summary>Process remaining audio and force a FINAL result.</summary>
        public void Flush() => Native.aas_flush(_handle);

        public float RealtimeSpeedup => Native.aas_realtime_get_speedup(_handle);

        public void Dispose()
        {
            if (_handle != IntPtr.Zero)
            {
                Native.aas_free(_handle);
                _handle = IntPtr.Zero;
            }
        }
    }
}
